"""Exploratory data analysis + cohort statistics.

Re-designs the reference's analysis scripts as reusable functions:
  * cohort_table — per-group mean±std / % + missing-% + chi²/t-test
    significance vs the label (clinical_analysis.ipynb cells 1-14);
  * ptbxl_label_stats — label distributions, AFIB ratio, age/weight
    t-tests (ptb_xl_eda.py:10-99);
  * image_size_audit — image dimension inventory (image_anaylsis.py:6-16);
  * signal_merge_report — missing-signal log (signal_analysis.py:8-27 is
    sources.merge_signal_csvs; this renders its report).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import pandas as pd
from scipy import stats


def cohort_table(
    df: pd.DataFrame,
    label_col: str,
    numeric_cols: Sequence[str],
    categorical_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """Per-label-group summary with significance tests: t-test for
    numeric columns, chi² for categorical; includes missing-%."""
    groups = sorted(df[label_col].dropna().unique())
    rows = []
    for col in numeric_cols:
        row: Dict[str, object] = {"variable": col, "type": "numeric"}
        samples = []
        for g in groups:
            vals = df.loc[df[label_col] == g, col].dropna()
            row[f"group_{g}"] = f"{vals.mean():.2f}±{vals.std():.2f}"
            samples.append(vals.to_numpy())
        row["missing_%"] = 100.0 * df[col].isna().mean()
        if len(samples) == 2 and all(len(s) > 1 for s in samples):
            row["p_value"] = stats.ttest_ind(
                samples[0], samples[1], equal_var=False
            ).pvalue
        rows.append(row)
    for col in categorical_cols:
        row = {"variable": col, "type": "categorical"}
        ct = pd.crosstab(df[col], df[label_col])
        for g in groups:
            if g in ct.columns:
                top = ct[g].idxmax()
                pct = 100.0 * ct[g].max() / max(ct[g].sum(), 1)
                row[f"group_{g}"] = f"{top} ({pct:.0f}%)"
        row["missing_%"] = 100.0 * df[col].isna().mean()
        if ct.shape[0] > 1 and ct.shape[1] > 1:
            row["p_value"] = stats.chi2_contingency(ct).pvalue
        rows.append(row)
    return pd.DataFrame(rows)


def ptbxl_label_stats(manifest: pd.DataFrame,
                      meta: Optional[pd.DataFrame] = None) -> Dict:
    """AFIB-vs-rhythm cohort stats (ptb_xl_eda.py): class counts, AFIB
    ratio, and — when patient metadata is supplied — age/weight Welch
    t-tests between classes."""
    counts = manifest["label"].value_counts().to_dict()
    n = int(manifest.shape[0])
    out: Dict[str, object] = {
        "n": n,
        "counts": {int(k): int(v) for k, v in counts.items()},
        "afib_ratio": float(counts.get(1, 0)) / max(n, 1),
    }
    if meta is not None:
        for col in ("age", "weight"):
            if col in meta.columns:
                a = meta.loc[manifest["label"] == 1, col].dropna()
                b = meta.loc[manifest["label"] == 0, col].dropna()
                if len(a) > 1 and len(b) > 1:
                    t = stats.ttest_ind(a, b, equal_var=False)
                    out[f"{col}_ttest_p"] = float(t.pvalue)
    return out


def image_size_audit(image_dir: str) -> pd.DataFrame:
    """Dimension inventory of every patient image
    (image_anaylsis.py:6-16)."""
    from PIL import Image

    rows: List[Dict] = []
    for d in sorted(os.listdir(image_dir)):
        sub = os.path.join(image_dir, d)
        if not os.path.isdir(sub):
            continue
        for f in os.listdir(sub):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                with Image.open(os.path.join(sub, f)) as im:
                    rows.append(
                        {"index": d, "file": f, "width": im.width,
                         "height": im.height}
                    )
    return pd.DataFrame(rows)


def signal_merge_report(frame: pd.DataFrame, missing: List[int]) -> str:
    lines = [
        f"merged signals: {frame.shape[0]} rows × {frame.shape[1]} samples",
        f"missing ids ({len(missing)}): {missing}",
    ]
    return "\n".join(lines)
