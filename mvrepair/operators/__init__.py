"""DataFrame operators of the mvrepair engine."""
