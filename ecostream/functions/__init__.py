"""Shared column-expression helpers (all JVM-side built-ins — no Python
UDFs in any hot path)."""
