"""Scalar column-expression helpers (all JVM-side built-ins)."""
