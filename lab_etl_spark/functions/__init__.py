"""functions subpackage (see package docstring)."""
