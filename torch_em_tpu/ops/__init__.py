"""Compute primitives: host-side (numpy/scipy/C++) and device-side (JAX/Pallas)."""

from . import host
