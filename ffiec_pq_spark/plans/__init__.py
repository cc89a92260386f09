"""Plan-inspection helpers (pushdown / broadcast / shuffle-count asserts)."""
