"""Export the pairwise matrix to labeled TSV, distance matrix, and newick.

Behavioral mirror of /root/reference/pykSpider/kSpider2/ks_export.py:

- labeled pairwise TSV ``kSpider_{base}_pairwise.tsv`` with group names;
- symmetric NxN distance matrix ``kSpider_{base}_distmat.tsv`` with
  ``1 - dist`` entries, zero diagonal/missing;
- optional newick via scipy single-linkage and the recursive conversion
  (reference :16-38).
"""

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from kspider_tpu.io import artifacts as artifacts_io
from kspider_tpu.utils.logger import Logger

DISTANCE_TO_COL = {
    "min_cont": 3,
    "avg_cont": 4,
    "max_cont": 5,
    "ani": 99,  # sentinel: read the separate ani column file
}


def get_newick(node, parent_dist, leaf_names, newick="") -> str:
    """scipy hierarchy tree -> newick (reference ks_export.py:16-38).

    Attribution: the recursive conversion is the public Stack Overflow
    recipe https://stackoverflow.com/a/31878514 (CC BY-SA) — the same
    snippet the reference credits; kept verbatim because byte-identical
    newick output (including the ``%.2f`` rounding) is part of the
    export contract."""
    if node.is_leaf():
        return "%s:%.2f%s" % (leaf_names[node.id], parent_dist - node.dist, newick)
    if len(newick) > 0:
        newick = "):%.2f%s" % (parent_dist - node.dist, newick)
    else:
        newick = ");"
    newick = get_newick(node.get_left(), node.dist, leaf_names, newick=newick)
    newick = get_newick(node.get_right(), node.dist, leaf_names, newick=",%s" % newick)
    return "(%s" % newick


def export_pairwise(
    index_prefix: str,
    distance_type: str = "max_cont",
    newick: bool = False,
    output_prefix: Optional[str] = None,
    logger: Optional[Logger] = None,
) -> Tuple[str, str, Optional[str]]:
    log = logger or Logger(quiet=True)
    if distance_type not in DISTANCE_TO_COL:
        log.ERROR("unknown distance!")
        raise ValueError("unknown distance")
    dist_col = DISTANCE_TO_COL[distance_type]

    index_basename = os.path.basename(index_prefix)
    pairwise_tsv = f"{index_prefix}_kSpider_pairwise.tsv"
    names_map_file = f"{index_prefix}.namesMap"
    seq_to_kmers_tsv = f"{index_prefix}_kSpider_seqToKmersNo.tsv"
    for _file in [pairwise_tsv, names_map_file, seq_to_kmers_tsv]:
        if not os.path.exists(_file):
            log.ERROR(f"File {_file} is not found.")
            raise FileNotFoundError(_file)

    names_map = artifacts_io.read_names_map(names_map_file)

    if output_prefix:
        labeled_out = f"{output_prefix}_pairwise.tsv"
        distmat_out = f"{output_prefix}_distmat.tsv"
        newick_out = f"{output_prefix}.newick"
    else:
        labeled_out = f"kSpider_{index_basename}_pairwise.tsv"
        distmat_out = f"kSpider_{index_basename}_distmat.tsv"
        newick_out = f"kSpider_{index_basename}.newick"

    distances: Dict[Tuple[str, str], float] = {}
    if distance_type == "ani":
        ani_file = index_prefix + "_kSpider_pairwise.ani_col.tsv"
        if not os.path.exists(ani_file):
            log.ERROR(
                "ANI was selected but the ani column file was not found.\n"
                "Please run: kspider pairwise --estimate-ani -i <index_prefix>"
            )
            raise FileNotFoundError(ani_file)
        with open(pairwise_tsv) as pw, open(labeled_out, "w") as new, open(
            ani_file
        ) as ani:
            log.INFO(f"Writing pairwise matrix to {labeled_out}")
            new.write(f"source1\tsource2\t{distance_type}\n")
            next(pw)
            next(ani)
            for line in pw:
                parts = line.rstrip("\n").split("\t")
                grp1 = names_map[int(parts[0])]
                grp2 = names_map[int(parts[1])]
                dist_metric = float(next(ani).strip())
                distances[(grp1, grp2)] = dist_metric
                new.write(f"{grp1}\t{grp2}\t{dist_metric}\n")
    else:
        with open(pairwise_tsv) as pw, open(labeled_out, "w") as new:
            log.INFO(f"Writing pairwise matrix to {labeled_out}")
            new.write(f"grp1\tgrp2\t{distance_type}\n")
            next(pw)
            for line in pw:
                parts = line.rstrip("\n").split("\t")
                grp1 = names_map[int(parts[0])]
                grp2 = names_map[int(parts[1])]
                dist_metric = float(parts[dist_col])
                distances[(grp1, grp2)] = dist_metric
                new.write(f"{grp1}\t{grp2}\t{dist_metric}\n")

    unique_ids = sorted({x for pair in distances for x in pair})
    df = pd.DataFrame(index=unique_ids, columns=unique_ids, dtype=object)
    for (a, b), v in distances.items():
        df.loc[a, b] = 1 - v
        df.loc[b, a] = 1 - v
    df = df.fillna(0)
    log.INFO(f"Writing distance matrix to {distmat_out}")
    df.to_csv(distmat_out, sep="\t")

    newick_path = None
    if newick:
        from warnings import simplefilter

        from scipy.cluster.hierarchy import ClusterWarning, linkage, to_tree

        simplefilter("ignore", ClusterWarning)

        loaded_df = pd.read_csv(distmat_out, sep="\t")
        log.INFO(f"Writing newick to {newick_out}.")
        names = list(loaded_df.columns[1:])
        dist = loaded_df[loaded_df.columns[1:]].to_numpy()
        z = linkage(dist, "single")
        tree = to_tree(z, False)
        nw = get_newick(tree, tree.dist, names)
        with open(newick_out, "w") as f:
            f.write(nw)
        newick_path = newick_out

    log.SUCCESS("Done.")
    return labeled_out, distmat_out, newick_path
