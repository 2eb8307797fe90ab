"""Lineage, metrics and drift checks over committed runs."""
