"""Filled in by build plan."""
