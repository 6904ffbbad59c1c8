"""Array-valued per-entity operators: periodogram spectra and dense dm-dt
maps (the reference's ``freq_power()`` / ``DmDt.points`` / ``DmDt.gausses``
surfaces, src/features.rs:4632-4706 and src/dmdt.rs:156-420).

Each returns one row per entity with ``array<double>`` payloads — the Arrow
round trip keeps them columnar end to end.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.kernels import periodogram_power
from .dmdt import dmdt_gausses_kernel, dmdt_points_kernel, normalize_dmdt

__all__ = ["periodogram_freq_power", "dmdt_maps"]


def periodogram_freq_power(obs: DataFrame, entity_col: str = "doc_id",
                           t_col: str = "t", m_col: str = "m",
                           resolution: float = 10.0,
                           max_freq_factor: float = 1.0,
                           nyquist="average",
                           normalization: str = "psd") -> DataFrame:
    """(entity, freqs array, power array) — raw Lomb-Scargle grid per
    entity."""
    schema = T.StructType([
        obs.schema[entity_col],
        T.StructField("freqs", T.ArrayType(T.DoubleType()), False),
        T.StructField("power", T.ArrayType(T.DoubleType()), False),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[t_col].to_numpy(np.float64)
        order = np.argsort(t, kind="mergesort")
        t = t[order]
        m = pdf[m_col].to_numpy(np.float64)[order]
        freqs, power = periodogram_power(
            t, m, resolution=resolution, max_freq_factor=max_freq_factor,
            nyquist=nyquist, normalization=normalization)
        return pd.DataFrame({entity_col: [pdf[entity_col].iloc[0]],
                             "freqs": [freqs], "power": [power]})

    return obs.select(entity_col, t_col, m_col) \
        .groupBy(entity_col).applyInPandas(fn, schema)


def dmdt_maps(obs: DataFrame, entity_col: str = "doc_id", t_col: str = "t",
              m_col: str = "m", sigma_col: Optional[str] = None,
              dt_edges: Optional[Sequence[float]] = None,
              dm_edges: Optional[Sequence[float]] = None,
              norm: Sequence[str] = (),
              gausses: bool = False) -> DataFrame:
    """Dense per-entity dm-dt map flattened row-major into ``array<double>``
    plus the grid shape.  ``gausses=True`` uses the erf-smeared variant
    (requires sigma)."""
    dt_e = np.asarray(dt_edges if dt_edges is not None
                      else np.logspace(-1, 2, 17))
    dm_e = np.asarray(dm_edges if dm_edges is not None
                      else np.linspace(-2, 2, 17))
    cols = [entity_col, t_col, m_col]
    if gausses:
        if sigma_col is None:
            raise ValueError("gausses requires sigma_col")
        cols.append(sigma_col)
    schema = T.StructType([
        obs.schema[entity_col],
        T.StructField("dmdt", T.ArrayType(T.DoubleType()), False),
        T.StructField("n_dt", T.IntegerType(), False),
        T.StructField("n_dm", T.IntegerType(), False),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[t_col].to_numpy(np.float64)
        order = np.argsort(t, kind="mergesort")
        t = t[order]
        m = pdf[m_col].to_numpy(np.float64)[order]
        if gausses:
            s = pdf[sigma_col].to_numpy(np.float64)[order]
            hist = dmdt_gausses_kernel(t, m, s, dt_e, dm_e)
        else:
            hist = dmdt_points_kernel(t, m, dt_e, dm_e)
        hist = normalize_dmdt(hist, norm)
        return pd.DataFrame({entity_col: [pdf[entity_col].iloc[0]],
                             "dmdt": [hist.ravel()],
                             "n_dt": [hist.shape[0]],
                             "n_dm": [hist.shape[1]]})

    return obs.select(*cols).groupBy(entity_col).applyInPandas(fn, schema)
