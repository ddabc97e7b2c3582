"""Plan-shape inspection helpers (the `.explain` discipline)."""
