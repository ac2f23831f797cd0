"""Pure-Python deterministic extraction core.

Everything in this subpackage is dependency-free (stdlib only), side-effect
free and deterministic: no wall-clock reads (an explicit ``as_of`` date is
threaded through where the reference used ``date.today()``), no
``PYTHONHASHSEED``-dependent hashing (crc32/sha1 only), no environment
lookups.  The Ray stages in ``ocr_engine_ray.stages`` and the
single-process oracle in ``ocr_engine_ray.oracle`` call these same
functions, so any per-turn divergence observed in tests is by construction
a Ray-layer (ordering / partitioning / batching) bug.
"""
