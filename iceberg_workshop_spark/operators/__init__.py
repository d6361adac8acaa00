"""Relational operators: scans, filters, joins, aggregates, windows, set ops."""
