"""cuttana_ray — a Ray-Data-native link-graph analytics engine.

From-scratch reimplementation of the capabilities of the reference CUTTANA
streaming graph partitioner (Rust port at ``/root/reference``; algorithm from
"CUTTANA: Scalable Graph Partitioning for Faster Distributed Graph Databases
and Analytics", VLDB, whose phase 1 extends the FENNEL streaming objective,
Tsourakakis et al., WSDM 2014), extended into a full engine:

* transcript → edge-table extraction (``stages.edges``)
* vocabulary encoding to dense int ids (``stages.vocab``)
* Cuttana streaming partitioner as a Ray stage (``stages.partition_stage``)
* partition quality metrics (``stages.metrics``)
* PageRank / connected components / label propagation / triangle counting
  (``pipelines``), shuffle mode and per-partition CSR actor mode
* training-data ops: dedup, similarity search, text stats (``functions``)

Everything is ``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow;
the only sequential component is the partitioner core itself (inherently
one-pass; ``/root/reference/src/cuttana.rs:30-56``).
"""

from cuttana_ray.config import CuttanaConfig

# import polars EAGERLY (under the import lock) so its lazy attribute
# registration can never race concurrently-starting Ray worker threads
# (observed: "module 'polars._reexport' has no attribute 'Series'" in a
# fused MapBatches chain at 32 cpus); optional — only the siphash-based
# kernels need it, and they raise their own ImportError if reached
try:
    import polars as _polars  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__version__ = "0.1.0"
__all__ = ["CuttanaConfig"]
