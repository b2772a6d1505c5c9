"""Operators — each returns a DataFrame; nothing collects to the driver."""
