"""streaming subpackage (see package docstring)."""
