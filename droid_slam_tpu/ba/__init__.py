"""ba subpackage."""
