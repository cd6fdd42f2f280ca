"""sources subpackage (see package docstring)."""
