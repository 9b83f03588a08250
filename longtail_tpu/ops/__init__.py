"""Compute kernels: CDC boundary scan, chunk hashing, block codecs.

Every kernel has a host-side (numpy) oracle and a device-side (jax/Pallas)
implementation producing bit-identical results; tests cross-check them and
anchor them against the reference C library's known-answer vectors.
"""
