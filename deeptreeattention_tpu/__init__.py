"""DeepTreeAttention-TPU: a TPU-native tree-species classification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
weecology/DeepTreeAttention (reference: /root/reference): NEON field data ->
crown detection -> per-crown hyperspectral crops -> multi-year hierarchical
species classifier -> landscape-scale tile prediction.

Design stance (not a port):
  * Compute path: flax models, jit-compiled preprocessing, Pallas fused
    kernels for the Hang2020 conv-attention ladder, bfloat16 on the MXU.
  * Scale-out: ``jax.sharding.Mesh`` + ``shard_map`` data parallelism over
    ICI replaces single-GPU Lightning; a host-side futures pool replaces
    dask/SLURM for the IO-bound ETL.
  * Geospatial IO: an in-house geo engine (GeoTIFF + ESRI shapefile codecs,
    box/point geometry, UTM reprojection) with a C++ fast path replaces
    GDAL/GEOS/rasterio/geopandas.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DTA_PLATFORM"):
    # The axon sitecustomize force-selects the TPU platform at interpreter
    # boot; DTA_PLATFORM=cpu (etc.) lets CLI runs and tests override it
    # before any backend initializes.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DTA_PLATFORM"])
