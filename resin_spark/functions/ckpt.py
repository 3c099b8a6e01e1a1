"""Opt-out lazy localCheckpoint helper (r11 optimization round).

Every r11 shared-subtree checkpoint goes through :func:`opt_checkpoint`
with a site tag, so a single-session A/B can flip any subset off via
``RESIN_NOCKPT=site1,site2`` (or ``all``) WITHOUT code edits — the
methodology that survives this machine's ±30% fresh-session noise
(tools/ab_r11.py alternates variants inside one session). Default is
checkpoint ON; the env override exists for measurement, not for
production tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def opt_checkpoint(df: DataFrame, site: str) -> DataFrame:
    off = os.environ.get("RESIN_NOCKPT", "")
    # strip tokens: RESIN_NOCKPT='a, b' must disable site 'b' too
    # (ADVICE r11 — a silent A/B mis-measurement risk otherwise)
    if off and (off == "all" or site in {s.strip() for s in off.split(",")}):
        return df
    return df.localCheckpoint(eager=False)
