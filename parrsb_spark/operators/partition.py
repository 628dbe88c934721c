"""Top-level partitioner dispatch — the `parrsb_part_mesh` analogue.

The reference selects RSB / RCB / RIB via ``options->partitioner``
(ref /root/reference/src/parrsb.c:237-259, values 0/1/2) and disables
the geometric paths when no coordinates are supplied (ref
src/parrsb.c:250). Same contract here, DataFrame-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from parrsb_spark.config import EngineOptions, default_options


def partition_graph(
    k: int,
    edges: DataFrame | None = None,
    coords: DataFrame | None = None,
    opts: EngineOptions | None = None,
    **rsb_kwargs,
) -> DataFrame:
    """(vid, part) with part ∈ [0, k), by `opts.partitioner`:

    - ``rsb`` (default): spectral, needs `edges`; `coords` optionally
      enables the rsb_pre geometric pre-partitioner.
    - ``rcb`` / ``rib``: geometric, need `coords`.
    """
    opts = opts or default_options()
    p = opts.partitioner
    if p == "rsb":
        if edges is None:
            raise ValueError("partitioner='rsb' needs an edge DataFrame")
        from parrsb_spark.operators.rsb import rsb_partition

        return rsb_partition(edges, k, opts=opts, coords=coords, **rsb_kwargs)
    if p in ("rcb", "rib"):
        if coords is None:
            # ref parrsb.c:250: geometric partitioners require coordinates
            raise ValueError(f"partitioner={p!r} needs a coords DataFrame")
        if p == "rcb":
            from parrsb_spark.operators.rcb import rcb_partition

            return rcb_partition(coords, k)
        from parrsb_spark.operators.rib import rib_partition

        return rib_partition(coords, k)
    raise ValueError(f"unknown partitioner {p!r} (rsb | rcb | rib)")
