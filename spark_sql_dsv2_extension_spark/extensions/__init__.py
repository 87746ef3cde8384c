"""extensions subpackage."""
