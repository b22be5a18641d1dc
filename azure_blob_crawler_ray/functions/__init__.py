"""Scalar/vector function library shared by engine stages and the oracle
(tokenization metrics, deterministic embedder, URL canonicalization,
fingerprints). Keeping these in one place is what makes "engine == oracle
under identical parameters" well-defined.
"""
