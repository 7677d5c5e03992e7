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
        # Align by POSITION, not index: a boolean Series built on
        # `manifest` indexed into a distinct `meta` frame raises (or
        # silently compares wrong patients when the indexes happen to
        # overlap). Require equal lengths — the rows must correspond.
        if len(meta) != len(manifest):
            raise ValueError(
                f"meta has {len(meta)} rows but manifest has "
                f"{len(manifest)} — pass per-record metadata aligned "
                "with the manifest rows"
            )
        is_af = (manifest["label"] == 1).to_numpy()
        for col in ("age", "weight"):
            if col in meta.columns:
                vals = meta[col].to_numpy()
                a = pd.Series(vals[is_af]).dropna()
                b = pd.Series(vals[~is_af]).dropna()
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


def main(argv=None):
    """CLI mirroring the reference's runnable analysis scripts
    (`python ptb_xl_eda.py`, `python image_anaylsis.py`, the
    clinical_analysis notebook):

        python -m ecgmm_tpu.tools.eda cohort clinical.csv --label label
        python -m ecgmm_tpu.tools.eda ptbxl ./data/ptbxl
        python -m ecgmm_tpu.tools.eda images ./data/images
    """
    import argparse
    import json

    p = argparse.ArgumentParser(
        description=main.__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cohort", help="per-group stats + significance")
    c.add_argument("clinical_csv")
    c.add_argument("--label", default="label")
    c.add_argument("--numeric", default="AGE,Wt",
                   help="comma list of numeric columns")
    c.add_argument("--categorical", default="",
                   help="comma list of categorical columns")

    x = sub.add_parser("ptbxl", help="PTB-XL AFIB-vs-rhythm label stats")
    x.add_argument("data_dir", help="dir containing ptbxl_database.csv")

    i = sub.add_parser("images", help="image dimension inventory")
    i.add_argument("image_dir")

    args = p.parse_args(argv)
    if args.cmd == "cohort":
        df = pd.read_csv(args.clinical_csv)
        out = cohort_table(
            df, args.label,
            [s for s in args.numeric.split(",") if s],
            [s for s in args.categorical.split(",") if s],
        )
        print(out.to_string(index=False))
    elif args.cmd == "ptbxl":
        from ecgmm_tpu.data.sources import load_ptbxl_manifest

        manifest = load_ptbxl_manifest(args.data_dir)
        # the manifest carries age/weight aligned (sources.py), enabling
        # the reference's between-class t-tests (ptb_xl_eda.py)
        meta = (
            manifest
            if {"age", "weight"} & set(manifest.columns) else None
        )
        print(json.dumps(ptbxl_label_stats(manifest, meta), indent=1))
    elif args.cmd == "images":
        out = image_size_audit(args.image_dir)
        print(out.to_string(index=False))
        if len(out):
            sizes = out.groupby(["width", "height"]).size()
            print("\nsize distribution:")
            print(sizes.to_string())


if __name__ == "__main__":
    main()
