"""Column-level function library (decode / timestamps / text / vectors)."""
