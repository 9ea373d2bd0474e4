"""Column-level function library (hashing, cleaning, text, vectors)."""
