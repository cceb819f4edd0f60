"""Persistence for the pipeline's driver-held models.

Training is a cluster job; scoring usually runs in OTHER jobs (nightly
corpus refreshes, streaming gates), so the k-means centroids, PQ
codebooks, and classifier weights need a durable, engine-neutral format.
JSON sidecars: every model here is small by construction (centroids,
codebooks, vocab-bounded weights — kilobytes to a few megabytes), so a
single driver-side file beats a parquet dataset of one row, stays
human-diffable, and round-trips floats exactly via repr/float.
"""

from __future__ import annotations

import json
import os
from typing import Any


def _write(path: str, kind: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"kind": kind, **payload}, f)


def _read(path: str, kind: str) -> dict[str, Any]:
    with open(path) as f:
        data = json.load(f)
    if data.get("kind") != kind:
        raise ValueError(
            f"{path} holds a {data.get('kind')!r} model, expected {kind!r}"
        )
    return data


def save_kmeans(model, path: str) -> None:
    _write(path, "kmeans", {
        "centroids": model.centroids, "n_iter": model.n_iter,
    })


def load_kmeans(path: str):
    from spark_timeseries_spark.pipeline.clustering import KMeansModel

    d = _read(path, "kmeans")
    return KMeansModel(
        centroids=[[float(x) for x in c] for c in d["centroids"]],
        n_iter=int(d["n_iter"]),
    )


def save_pq(model, path: str) -> None:
    _write(path, "pq", {
        "dim": model.dim, "m": model.m, "k": model.k,
        "codebooks": model.codebooks,
    })


def load_pq(path: str):
    from spark_timeseries_spark.pipeline.pq import PQModel

    d = _read(path, "pq")
    return PQModel(
        dim=int(d["dim"]), m=int(d["m"]), k=int(d["k"]),
        codebooks=[
            [[float(x) for x in cent] for cent in book]
            for book in d["codebooks"]
        ],
    )


def save_logreg(model, path: str) -> None:
    _write(path, "logreg", {
        "weights": model.weights, "bias": model.bias, "n_iter": model.n_iter,
    })


def load_logreg(path: str):
    from spark_timeseries_spark.pipeline.classifier import LogRegModel

    d = _read(path, "logreg")
    return LogRegModel(
        weights={t: float(w) for t, w in d["weights"].items()},
        bias=float(d["bias"]),
        n_iter=int(d["n_iter"]),
    )


def save_bpe(model, path: str) -> None:
    _write(path, "bpe", {
        "merges": [list(m) for m in model.merges],
        "pair_counts": model.pair_counts,
        "alphabet": list(model.alphabet),
    })


def load_bpe(path: str):
    from spark_timeseries_spark.pipeline.bpe import BPEModel

    d = _read(path, "bpe")
    return BPEModel(
        merges=[tuple(m) for m in d["merges"]],
        pair_counts=[int(c) for c in d["pair_counts"]],
        alphabet=[str(s) for s in d.get("alphabet", [])],
    )
