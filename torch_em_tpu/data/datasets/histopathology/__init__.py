"""Histopathology datasets (to be populated in upcoming rounds)."""
