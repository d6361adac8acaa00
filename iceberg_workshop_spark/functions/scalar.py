"""Placeholder — filled in as the inventory widens."""
