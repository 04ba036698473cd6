"""CLI experiment entry points mirroring the reference flag surfaces."""
