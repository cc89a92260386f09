"""Deterministic FFIEC-shaped fixture builders (shared by tests and the
end-to-end ETL demo query)."""
