"""Named, oracle-checked query definitions (one module per SURVEY.md §2 area)."""
