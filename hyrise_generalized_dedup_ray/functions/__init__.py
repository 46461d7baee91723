"""Vectorized, Ray-free kernels (NumPy / pandas / Arrow only).

These are the shared computational core: the distributed stages
(`stages/`) and the sequential reference oracle
(`pipelines/reference.py`) both call these functions, so signatures are
bit-identical between the two by construction — only the *composition*
(distributed shuffle vs in-process loops) differs.
"""
