"""Containment -> ANI estimation.

The reference shells out to ``sourmash.distance_utils.containment_to_distance``
(/root/reference/pykSpider/kSpider2/ks_pairwise.py:78-80): the point
estimate is ``distance = 1 - containment**(1/ksize)`` and
``ani = 1 - distance = containment**(1/ksize)`` (the classic Mash/FracMinHash
k-th-root identity).  We implement it natively (sourmash is not a
dependency of this framework), vectorized over pair arrays.

The ``--estimate-ani`` flow reads the pairwise TSV, computes
``ani_1_in_2`` from min_containment against group 2's k-mer budget and
``ani_2_in_1`` from max_containment against group 1's, and writes their
average as a single ``avg_ani`` column file, mirroring
/root/reference/pykSpider/kSpider2/ks_pairwise.py:62-86.
"""

from typing import Optional

import numpy as np


def containment_to_ani(containment, ksize: int) -> np.ndarray:
    """Point-estimate ANI = containment ** (1/k); 0 maps to 0."""
    c = np.asarray(containment, dtype=np.float64)
    out = np.zeros_like(c)
    pos = c > 0
    out[pos] = np.power(c[pos], 1.0 / ksize)
    return out


def write_ani_column(
    prefix: str, ksize: int, scale: int
) -> str:
    """Post-process ``{p}_kSpider_pairwise.tsv`` into
    ``{p}_kSpider_pairwise.ani_col.tsv`` (one ``avg_ani`` value per row,
    same order)."""
    pairwise_file = prefix + "_kSpider_pairwise.tsv"
    out_file = prefix + "_kSpider_pairwise.ani_col.tsv"
    with open(pairwise_file) as pw, open(out_file, "w") as out:
        next(pw)
        out.write("avg_ani\n")
        for line in pw:
            parts = line.rstrip("\n").split("\t")
            min_containment = float(parts[3])
            max_containment = float(parts[5])
            ani_1_in_2 = float(containment_to_ani(min_containment, ksize))
            ani_2_in_1 = float(containment_to_ani(max_containment, ksize))
            avg_ani = (ani_1_in_2 + ani_2_in_1) / 2.0
            out.write(f"{avg_ani}\n")
    return out_file
