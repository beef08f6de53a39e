"""Pure-pandas reference implementation ("reference labels" oracle)."""
