"""Bulk strip-photo digitization → training-format signal table.

Closes the loop between the product's input (phone photos of lead-II
strips, `/root/reference/Groove/components/SubmitButton.tsx:35-48`) and
the training pipeline's input (an `ecg_signals.csv` frame indexed by
patient id, `/root/reference/dataset.py:129` — built in the reference
by merging ALREADY-digitized per-patient CSVs,
`/root/reference/signal_analysis.py:16-38`, with the digitization step
itself never shown). This tool performs that missing step with the
serving digitizer (`serve/digitize.py`: strip auto-location, red-grid
suppression, grid-pitch absolute-mV calibration) over a directory of
`{idx}.png|jpg` photos and writes:

  * `ecg_signals.csv` — one row per patient id, `target_len` samples,
    readable by `sources.load_hospital_tables` (index_col=0);
  * an optional per-image QUALITY REPORT (scale source, grid pitch,
    px/mV, ink coverage, crop, error) so a cohort can be audited —
    e.g. "which patients' voltages are assumed-scale rather than
    grid-calibrated?" — before anything is trained on it.

Photos that contain no discernible trace are logged (`error` column)
and excluded from the signal table; `--strict` turns any failure into
a hard error instead.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from ecgmm_tpu.serve import digitize

_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _find_images(image_dir: str) -> List[Tuple[int, str]]:
    out = []
    for f in os.listdir(image_dir):
        stem, ext = os.path.splitext(f)
        if ext.lower() in _EXTS and stem.isdigit():
            out.append((int(stem), os.path.join(image_dir, f)))
    out.sort()
    # duplicate patient ids (e.g. 3.jpg AND 3.png, format-conversion
    # leftovers) would silently overwrite each other's signal row and
    # duplicate the report index — which file is the patient's strip is
    # ambiguous, so refuse rather than guess
    dups = sorted({
        idx for (idx, _), (jdx, _) in zip(out, out[1:]) if idx == jdx
    })
    if dups:
        raise ValueError(
            f"duplicate numeric stems in {image_dir!r} for patient id(s) "
            f"{dups}: multiple files share an id (e.g. 3.jpg and 3.png) "
            "— remove or rename the extras so each patient has exactly "
            "one strip image"
        )
    return out


def digitize_directory(
    image_dir: str,
    target_len: int = 2476,
    strict: bool = False,
    px_per_mv: Optional[float] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Digitize every `{idx}.<ext>` strip photo in `image_dir`.

    Returns (signals, report): `signals` is the hospital-format frame
    (index = patient id, `target_len` float32 columns); `report` has
    one row per FOUND image with the digitization metadata, plus an
    `error` column (empty string when digitization succeeded)."""
    from PIL import Image, ImageOps

    found = _find_images(image_dir)
    if not found:
        raise FileNotFoundError(
            f"no numeric-stem images ({'/'.join(_EXTS)}) in {image_dir!r}"
        )
    rows, report = {}, []
    for idx, path in found:
        rec = {"index": idx, "file": os.path.basename(path),
               "scale_source": "", "grid_pitch_px": np.nan,
               "px_per_mv": np.nan, "ink_fraction": np.nan,
               "cropped": False, "error": ""}
        try:
            # apply the EXIF Orientation tag (phone cameras store
            # rotated shots as landscape pixels + a tag) before
            # digitizing — same as the serving decode path
            img = np.asarray(
                ImageOps.exif_transpose(Image.open(path)).convert("RGB")
            )
            mv, info = digitize.digitize_lead2_info(
                img, target_len=target_len, px_per_mv=px_per_mv
            )
            rows[idx] = mv
            rec.update(
                scale_source=info["scale_source"],
                grid_pitch_px=(np.nan if info["grid_pitch_px"] is None
                               else info["grid_pitch_px"]),
                px_per_mv=info["px_per_mv"],
                ink_fraction=info["ink_fraction"],
                cropped=info["crop"] is not None,
            )
        except Exception as e:  # noqa: BLE001 — per-file isolation
            if strict:
                raise RuntimeError(f"{path}: {e}") from e
            rec["error"] = str(e)
        report.append(rec)
    signals = pd.DataFrame.from_dict(rows, orient="index", dtype=np.float32)
    return signals, pd.DataFrame(report).set_index("index")


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("image_dir", help="directory of {idx}.png|jpg strips")
    p.add_argument("-o", "--out", default="ecg_signals.csv",
                   help="output signal table (hospital format)")
    p.add_argument("--report", default=None,
                   help="also write the per-image quality report CSV")
    p.add_argument("--target-len", type=int, default=2476)
    p.add_argument("--px-per-mv", type=float, default=None,
                   help="override the voltage scale instead of "
                        "grid-calibrating per image")
    p.add_argument("--strict", action="store_true",
                   help="fail on the first undigitizable image")
    args = p.parse_args(argv)
    if args.px_per_mv is not None and not (
        np.isfinite(args.px_per_mv) and args.px_per_mv > 0
    ):
        # reject here once instead of per-file: digitize_lead2_info
        # raises for every image, which non-strict mode would record as
        # N identical per-row errors
        p.error(f"--px-per-mv must be > 0, got {args.px_per_mv}")

    signals, report = digitize_directory(
        args.image_dir, target_len=args.target_len, strict=args.strict,
        px_per_mv=args.px_per_mv,
    )
    signals.to_csv(args.out)
    n_bad = int((report["error"] != "").sum())
    n_assumed = int((report["scale_source"] == "assumed").sum())
    print(f"digitized {len(signals)}/{len(report)} strips → {args.out} "
          f"({n_bad} failed, {n_assumed} assumed-scale)")
    if args.report:
        report.to_csv(args.report)
        print(f"quality report → {args.report}")


if __name__ == "__main__":
    main()
