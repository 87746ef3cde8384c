"""stub — filled in by build plan."""
