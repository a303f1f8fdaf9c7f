"""Verification subsystem: golden-model checks, the reference-compatible
structured debug log, and the op-by-op replay oracle (the rebuild of
verify.py + the reference's `-d` debug machinery)."""
