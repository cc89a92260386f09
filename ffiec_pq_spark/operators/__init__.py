"""Relational operators and scale extensions."""
