"""User-defined function surfaces beyond Python UDFs (SQL UDFs)."""
