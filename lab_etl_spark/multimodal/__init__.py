"""multimodal subpackage (see package docstring)."""
