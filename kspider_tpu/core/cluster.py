"""Threshold clustering over the pairwise matrix.

Behavioral mirror of the reference's ``Clusters`` class
(/root/reference/pykSpider/kSpider2/ks_clustering.py:10-137):

- nodes: one per namesMap entry, node index = groupID - 1;
- edges: pairwise rows whose selected distance column * 100 >= cutoff
  (columns: min_cont=3, avg_cont=4, max_cont=5; ``ani`` reads the separate
  ``..ani_col.tsv`` single-column file);
- components: connected components (device pointer-jumping kernel by
  default, scipy fallback) written one comma-joined cluster per line to
  ``{prefix}_kSpider_clusters_{cutoff}%.tsv``.

The cutoff is received on the CLI as 0..1 and multiplied by 100
(/root/reference/pykSpider/kSpider2/ks_clustering.py:157), and the output
filename embeds that scaled value with Python float formatting (e.g.
``..._clusters_95.0%.tsv``).
"""

import os
from typing import List, Optional, Tuple

import numpy as np

from kspider_tpu.io import artifacts as artifacts_io
from kspider_tpu.ops import cc as cc_ops
from kspider_tpu.utils.logger import Logger

DISTANCE_TO_COL = {
    "min_cont": 3,
    "avg_cont": 4,
    "max_cont": 5,
    "ani": 6,
}


def load_pairwise_edges(
    prefix: str, dist_type: str, cutoff_percent: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Stream the pairwise TSV and return the thresholded edge list
    (0-based node ids)."""
    pairwise_file = prefix + "_kSpider_pairwise.tsv"
    srcs: List[int] = []
    dsts: List[int] = []
    if dist_type == "ani":
        ani_file = prefix + "_kSpider_pairwise.ani_col.tsv"
        with open(pairwise_file) as pw, open(ani_file) as ani:
            next(pw)
            next(ani)
            for row in pw:
                parts = row.rstrip("\n").split("\t")
                distance = float(next(ani).strip()) * 100.0
                if distance < cutoff_percent:
                    continue
                srcs.append(int(parts[0]) - 1)
                dsts.append(int(parts[1]) - 1)
    else:
        col = DISTANCE_TO_COL[dist_type]
        with open(pairwise_file) as pw:
            next(pw)
            for row in pw:
                parts = row.rstrip("\n").split("\t")
                distance = float(parts[col]) * 100.0
                if distance < cutoff_percent:
                    continue
                srcs.append(int(parts[0]) - 1)
                dsts.append(int(parts[1]) - 1)
    return np.asarray(srcs, dtype=np.int32), np.asarray(dsts, dtype=np.int32)


def cluster_index(
    prefix: str,
    cutoff: float,
    dist_type: str = "max_cont",
    use_tpu: bool = True,
    logger: Optional[Logger] = None,
) -> str:
    """Run the full cluster stage; returns the output file path.

    ``cutoff`` is in 0..1 (CLI semantics); internally scaled to percent.
    """
    log = logger or Logger(quiet=True)
    if dist_type not in DISTANCE_TO_COL:
        log.ERROR("unknown distance!")
        raise ValueError("unknown distance")

    cutoff_percent = float(cutoff) * 100.0
    names_map = artifacts_io.read_names_map(prefix + ".namesMap")
    n = max(names_map) if names_map else 0

    if dist_type == "ani" and not os.path.exists(
        prefix + "_kSpider_pairwise.ani_col.tsv"
    ):
        log.ERROR(
            f"ANI was selected, but the ani file "
            f"{prefix}_kSpider_pairwise.ani_col.tsv was not found!"
        )
        raise FileNotFoundError("ani column file missing")

    log.INFO("Loading TSV pairwise file")
    src, dst = load_pairwise_edges(prefix, dist_type, cutoff_percent)

    log.INFO("Clustering...")
    if use_tpu:
        labels = cc_ops.connected_components(src, dst, n)
    else:
        labels = cc_ops.connected_components_scipy(src, dst, n)
    comps = cc_ops.labels_to_clusters(labels)
    log.INFO(f"number of clusters: {len(comps)}")

    out_path = prefix + f"_kSpider_clusters_{cutoff_percent}%.tsv"
    with open(out_path, "w") as f:
        for comp in comps:
            f.write(",".join(names_map[int(node) + 1] for node in comp) + "\n")
    return out_path
