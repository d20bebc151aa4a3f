"""Wave 77: integer batch perceptron — brute dual."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_perceptron_brute(ray_session):
    out = entry._perceptron_int(SF).to_pandas().sort_values("dim")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.round(
        np.stack(emb["embedding"].to_numpy()) * entry.PERC_SCALE
    ).astype(np.int64)
    y = 2 * (emb["label"].to_numpy().astype(np.int64) % 2) - 1
    w1 = (y[:, None] * x).sum(axis=0)
    margin = y * (x @ w1)
    mis = margin <= 0
    w2 = w1 + (y[mis][:, None] * x[mis]).sum(axis=0)
    assert (out["w1"].to_numpy() == w1).all()
    assert (out["w2"].to_numpy() == w2).all()
    assert (out["n_mis_epoch2"].to_numpy() == int(mis.sum())).all()
    # epoch-2 training error does not exceed epoch-1 (all-misclassified) size
    assert int(mis.sum()) <= len(y)
    # the update moved the decision function toward the misclassified side
    if mis.any():
        assert (y[mis] * (x[mis] @ w2)).sum() >= (y[mis] * (x[mis] @ w1)).sum()
