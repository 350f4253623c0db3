"""Pluggable Python Data Sources (PySpark 4 DataSource API)."""
