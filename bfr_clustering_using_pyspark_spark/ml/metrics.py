"""Clustering evaluation — distributed NMI.

Parity with the reference's ``get_nmi.py`` (sklearn
``normalized_mutual_info_score``), re-expressed Spark-first: the
only distributed work is the contingency aggregation
``groupBy(pred, truth).count()`` (one shuffle, k×k tiny output);
entropies/MI are computed on the collected contingency table.
Normalization is the arithmetic mean of entropies (sklearn's
default ``average_method='arithmetic'``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def nmi_from_contingency(cont: pd.DataFrame) -> float:
    """cont columns: pred, truth, n."""
    n_total = cont["n"].sum()
    if n_total == 0:
        return 0.0
    pij = cont.pivot_table(index="pred", columns="truth", values="n", fill_value=0).to_numpy().astype(float)
    pij /= n_total
    pi = pij.sum(axis=1)
    pj = pij.sum(axis=0)
    nz = pij > 0
    outer = np.outer(pi, pj)
    mi = (pij[nz] * np.log(pij[nz] / outer[nz])).sum()
    h_i = -(pi[pi > 0] * np.log(pi[pi > 0])).sum()
    h_j = -(pj[pj > 0] * np.log(pj[pj > 0])).sum()
    denom = (h_i + h_j) / 2.0
    if denom <= 0:
        return 1.0 if mi == 0 else 0.0
    return float(mi / denom)


def nmi_score(assigned: DataFrame, truth: DataFrame, pred_col: str = "cluster",
              truth_col: str = "label", id_col: str = "id") -> float:
    """NMI between a clustering (id, cluster) and ground truth
    (id, label). One join + one tiny aggregation."""
    cont = (
        assigned.join(truth.select(id_col, truth_col), id_col)
        .groupBy(pred_col, truth_col)
        .count()
        .toPandas()
        .rename(columns={pred_col: "pred", truth_col: "truth", "count": "n"})
    )
    return nmi_from_contingency(cont)
