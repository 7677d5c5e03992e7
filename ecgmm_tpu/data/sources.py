"""Host-side raw-data ingestion for every dataset family the reference
supports.

Covers the hospital trimodal layout (labels xlsx/csv + clinical.csv +
ecg_signals.csv + per-patient image dirs — `/root/reference/dataset.py:
118-213`), per-record signal CSVs (`signal_analysis.py:16-38`), PTB-XL
(`train_signal_only_ptb.py:178-228`), PhysioNet/CinC 2017
(`train_physionet.py:86-107`), and 12-lead per-patient xlsx
(`train_signal_12_af.py:52-59`).

The reference reads WFDB records through the `wfdb` package; that package
is not part of this image, so a minimal WFDB reader (format-16 .dat +
.hea / .mat variants, covering PTB-XL's and CinC2017's actual storage) is
implemented here natively.
"""

from __future__ import annotations

import ast
import os
import re
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Tabular readers
# ---------------------------------------------------------------------------

def read_table(path: str) -> pd.DataFrame:
    """Read xlsx (if an engine is available) or csv. The reference uses
    pd.read_excel for labels (dataset.py:127); this environment has no
    xlsx engine, so a same-named .csv sibling is accepted."""
    if path.endswith((".xlsx", ".xls")):
        csv_path = os.path.splitext(path)[0] + ".csv"
        if not os.path.exists(path) and os.path.exists(csv_path):
            return pd.read_csv(csv_path)
        try:
            return pd.read_excel(path)
        except ImportError:
            if os.path.exists(csv_path):
                return pd.read_csv(csv_path)
            raise
    return pd.read_csv(path)


def load_hospital_tables(
    label_file: str, clinical_file: str, ecg_csv: str
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Load and normalise the three tabular sources
    (reference dataset.py:127-142)."""
    labels_df = read_table(label_file)
    clinical_df = read_table(clinical_file)
    if "ECG" in clinical_df.columns:
        clinical_df = clinical_df.drop("ECG", axis=1)
    if "IDX" in clinical_df.columns:
        clinical_df = clinical_df.rename(columns={"IDX": "index"})
    clinical_df["index"] = clinical_df["index"].astype(int)
    ecg_signals = pd.read_csv(ecg_csv, index_col=0)
    ecg_signals.index = ecg_signals.index.astype(int)
    return labels_df, clinical_df, ecg_signals


def list_image_indices(image_dir: str) -> set:
    """Patient ids that have an image folder (reference dataset.py:144)."""
    if not os.path.isdir(image_dir):
        return set()
    return {int(d) for d in os.listdir(image_dir) if d.isdigit()}


def load_images(
    image_dir: str, indices: Sequence[int],
    hw: Tuple[int, int] = (224, 224),
) -> np.ndarray:
    """Decode + resize lead-II JPGs to uint8 (N, H, W, 3).

    Normalisation to ±1 floats happens **on device** inside the model input
    stage — keeping HBM-resident images uint8 quarters host→device traffic
    vs the reference's per-item PIL→float CPU path (dataset.py:58-64)."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    out = np.empty((len(indices), hw[0], hw[1], 3), np.uint8)

    def decode(i_idx):
        i, idx = i_idx
        p = os.path.join(
            image_dir, str(idx), f"{str(idx).zfill(3)}ECG_lead2.jpg"
        )
        with Image.open(p) as im:
            im = im.convert("RGB").resize(
                (hw[1], hw[0]), Image.Resampling.BILINEAR
            )
            out[i] = np.asarray(im)

    # PIL decode releases the GIL; threads parallelise the one-off
    # materialisation read (the reference re-decodes per epoch per item).
    with ThreadPoolExecutor() as pool:
        list(pool.map(decode, enumerate(indices)))
    return out


def merge_signal_csvs(signal_dir: str, out_csv: Optional[str] = None
                      ) -> Tuple[pd.DataFrame, List[int]]:
    """Merge ./data/signals/{idx}.csv into one frame, logging missing ids
    (reference signal_analysis.py:16-38)."""
    rows, missing = {}, []
    ids = sorted(
        int(os.path.splitext(f)[0])
        for f in os.listdir(signal_dir)
        if f.endswith(".csv") and os.path.splitext(f)[0].isdigit()
    )
    # The reference iterates ids 1..N and logs every absent file as
    # missing (signal_analysis.py:14-26); report directory gaps the same
    # way, not just parse failures of files that exist.
    missing.extend(sorted(set(range(1, max(ids) + 1)) - set(ids)) if ids
                   else [])
    for idx in ids:
        try:
            # header=None + first column — the reference reads the raw
            # headerless per-record CSVs with pd.read_csv(file,
            # header=None); df[0] (signal_analysis.py:20-21); reading
            # with a header row would eat the first sample as a name.
            df = pd.read_csv(
                os.path.join(signal_dir, f"{idx}.csv"), header=None
            )
            rows[idx] = df.iloc[:, 0].to_numpy(np.float32)
        except Exception:
            missing.append(idx)
    frame = pd.DataFrame.from_dict(rows, orient="index")
    if out_csv:
        frame.to_csv(out_csv)
    return frame, missing


def load_12lead_xlsx(path_fmt: str, indices: Sequence[int]) -> np.ndarray:
    """Per-patient {idx}_12leads.xlsx → (N, 12, T), reordering columns with
    the reference's lead permutation (train_signal_12_af.py:52-59)."""
    perm = [0, 4, 8, 5, 1, 9, 2, 6, 10, 3, 7, 11]
    lead_cols = [f"Lead_{i}" for i in range(1, 13)]
    mats = []
    for idx in indices:
        df = read_table(path_fmt.format(idx=idx))
        # Select the lead columns BY NAME like the reference
        # (df[['Lead_1'..'Lead_12']].values.T, train_signal_12_af.py:
        # 54-58) — positional selection would silently misassign leads
        # if a file carries an extra time/index column or a different
        # column order.
        if all(c in df.columns for c in lead_cols):
            df = df[lead_cols]
        elif df.shape[1] != 12:
            raise ValueError(
                f"{path_fmt.format(idx=idx)}: expected Lead_1..Lead_12 "
                f"columns or exactly 12 columns, got "
                f"{list(df.columns)[:14]}"
            )
        mats.append(df.to_numpy(np.float32).T[perm])
    return np.stack(mats)


# ---------------------------------------------------------------------------
# Minimal WFDB reader (replaces the wfdb package dependency)
# ---------------------------------------------------------------------------

class WFDBHeader(NamedTuple):
    record_name: str
    n_sig: int
    fs: float
    n_samples: int
    file_names: List[str]
    formats: List[int]
    gains: List[float]
    baselines: List[int]
    sig_names: List[str]
    # leading bytes to skip in each signal file (fmt '+offset' modifier,
    # e.g. CinC 2017's '16+24' .mat container header)
    offsets: Sequence[int] = ()


def read_wfdb_header(hea_path: str) -> WFDBHeader:
    """Parse a WFDB .hea file (the fields PTB-XL/CinC records actually
    use)."""
    with open(hea_path) as f:
        lines = [
            ln.strip()
            for ln in f
            if ln.strip() and not ln.startswith("#")
        ]
    rec = lines[0].split()
    record_name, n_sig = rec[0], int(rec[1])
    fs = float(rec[2].split("/")[0]) if len(rec) > 2 else 250.0
    n_samples = int(rec[3]) if len(rec) > 3 else 0

    file_names, formats, gains, baselines, sig_names = [], [], [], [], []
    offsets: List[int] = []
    for ln in lines[1 : 1 + n_sig]:
        parts = ln.split()
        file_names.append(parts[0])
        fmt_spec = parts[1]
        # fmt[+offset] only: the xN (samples/frame) and :skew modifiers
        # change the byte layout — silently stripping them would decode
        # garbage, so reject them loudly. +offset (leading bytes to skip
        # — CinC 2017 headers say '16+24' for the .mat container header)
        # is honored in read_wfdb.
        fm = re.fullmatch(r"(\d+)(?:\+(\d+))?", fmt_spec)
        if not fm:
            raise NotImplementedError(
                f"WFDB format spec {fmt_spec!r} (xN/:skew modifiers) "
                "not supported"
            )
        formats.append(int(fm.group(1)))
        offsets.append(int(fm.group(2) or 0))
        # gain[(baseline)][/units]; gain 0 means 'unknown, assume the
        # default 200 adu/mV' per the WFDB spec.
        gain_field = parts[2] if len(parts) > 2 else "200"
        m = re.match(r"([-\d.e+]+)(?:\(([-\d]+)\))?", gain_field)
        gain = float(m.group(1)) if m else 200.0
        gains.append(gain if gain != 0.0 else 200.0)
        if m and m.group(2):
            baseline = int(m.group(2))
        elif len(parts) > 4:
            # No parenthesized baseline: the spec says baseline equals
            # the ADC-zero field (field 5) — a real MIT-BIH header like
            # '100.dat 212 200 11 1024 995 -22131 0 MLII' has baseline
            # 1024, not 0.
            baseline = int(float(parts[4]))
        else:
            baseline = 0
        baselines.append(baseline)
        sig_names.append(parts[-1])
    return WFDBHeader(
        record_name, n_sig, fs, n_samples,
        file_names, formats, gains, baselines, sig_names, offsets,
    )


def read_wfdb(record_path: str, channels: Optional[Sequence[int]] = None
              ) -> Tuple[np.ndarray, WFDBHeader]:
    """wfdb.rdsamp equivalent for single-.dat records in formats
    16/32 (PTB-XL, CinC headers), 212 (MIT-BIH packed 12-bit), 80
    (offset-binary 8-bit) and 24 (3-byte LE), plus .mat-backed records
    (CinC 2017 ships v4 .mat files).

    Returns (signal[T, C] float64 in physical units, header)."""
    hdr = read_wfdb_header(record_path + ".hea")
    if len(set(hdr.file_names)) > 1:
        # Per-signal .dat files are legal WFDB; decoding file 0 as if it
        # held all channels interleaved would return garbage silently.
        raise NotImplementedError(
            f"multi-file WFDB records not supported: {hdr.file_names}"
        )
    dat = hdr.file_names[0]
    base = os.path.dirname(record_path)

    if dat.endswith(".mat"):
        from scipy.io import loadmat

        raw = loadmat(os.path.join(base, dat))["val"]  # (C, T)
        digital = raw.T.astype(np.float64)
    else:
        fmt = hdr.formats[0]
        off = hdr.offsets[0] if hdr.offsets else 0
        path = os.path.join(base, dat)
        if fmt == 16:
            digital = np.fromfile(path, dtype="<i2",
                                  offset=off).astype(np.float64)
        elif fmt == 32:
            digital = np.fromfile(path, dtype="<i4",
                                  offset=off).astype(np.float64)
        elif fmt == 212:
            # MIT-BIH: two 12-bit two's-complement samples per 3 bytes —
            # s0 = b1[3:0]·256 + b0, s1 = b1[7:4]·256 + b2.
            b = np.fromfile(path, dtype=np.uint8, offset=off)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
            s0 = ((b[:, 1] & 0x0F) << 8) | b[:, 0]
            s1 = ((b[:, 1] & 0xF0) << 4) | b[:, 2]
            pair = np.stack([s0, s1], axis=1).reshape(-1)
            digital = np.where(
                pair > 2047, pair - 4096, pair
            ).astype(np.float64)
        elif fmt == 80:
            # offset-binary 8-bit: stored byte − 128
            digital = (
                np.fromfile(path, dtype=np.uint8,
                            offset=off).astype(np.float64) - 128.0
            )
        elif fmt == 24:
            # 3-byte little-endian two's complement
            b = np.fromfile(path, dtype=np.uint8, offset=off)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            digital = np.where(
                v >= (1 << 23), v - (1 << 24), v
            ).astype(np.float64)
        else:
            raise NotImplementedError(f"WFDB format {fmt} not supported")
        # Format 212 pads odd sample counts to a byte boundary; crop to
        # the header's declared length before de-interleaving channels.
        # When the header omits the optional length field (n_samples==0)
        # an odd-length 212 record is ambiguous by construction — like
        # wfdb.rdsamp, we then infer length from the file size and a
        # trailing padding-decoded sample is kept.
        if hdr.n_samples:
            digital = digital[: hdr.n_samples * hdr.n_sig]
        digital = digital[: (len(digital) // hdr.n_sig) * hdr.n_sig]
        digital = digital.reshape(-1, hdr.n_sig)

    gains = np.asarray(hdr.gains)
    baselines = np.asarray(hdr.baselines, np.float64)
    physical = (digital - baselines) / gains
    if channels is not None:
        physical = physical[:, list(channels)]
    return physical, hdr


# ---------------------------------------------------------------------------
# PTB-XL / PhysioNet dataset manifests
# ---------------------------------------------------------------------------

# The 11 non-AF rhythm codes mapped to class 0 (reference
# train_signal_only_ptb.py:193-214).
PTBXL_RHYTHM_NEGATIVE = (
    "SR", "STACH", "SARRH", "SBRAD", "PACE", "SVARR",
    "BIGU", "AFLT", "SVTAC", "PSVT", "TRIGU",
)


def load_ptbxl_manifest(
    ptbxl_dir: str, min_likelihood: float = 100.0
) -> pd.DataFrame:
    """Parse ptbxl_database.csv and label AFIB@100→1 / rhythm@100→0, drop
    the rest (reference train_signal_only_ptb.py:183-214). Returns a frame
    with columns [record, label] where record is the filename_hr path."""
    db = pd.read_csv(os.path.join(ptbxl_dir, "ptbxl_database.csv"))
    db["scp_codes"] = db["scp_codes"].apply(ast.literal_eval)

    def lab(codes: Dict[str, float]) -> float:
        if codes.get("AFIB", 0) == min_likelihood:
            return 1
        for c in PTBXL_RHYTHM_NEGATIVE:
            if codes.get(c, 0) == min_likelihood:
                return 0
        return np.nan

    db["label"] = db["scp_codes"].apply(lab)
    db = db[db["label"].notna()]
    out = {
        "record": [
            os.path.join(ptbxl_dir, r) for r in db["filename_hr"]
        ],
        "label": db["label"].astype(np.int64).to_numpy(),
    }
    # patient metadata rides along (aligned by construction) so cohort
    # statistics (tools/eda.ptbxl_label_stats age/weight t-tests,
    # reference ptb_xl_eda.py) need no second parse
    for col in ("age", "weight"):
        if col in db.columns:
            out[col] = db[col].to_numpy()
    return pd.DataFrame(out)


def load_physionet_manifest(
    physionet_dir: str, data_subdir: str = "training2017",
    multiclass: bool = False,
) -> pd.DataFrame:
    """REFERENCE.csv: N→0, {A,O}→1 binary (train_physionet.py:91-93) or
    N/A/O→0/1/2 3-class (train_physionet_multi.py:71); '~' noise dropped."""
    ref = pd.read_csv(
        os.path.join(physionet_dir, "REFERENCE.csv"),
        header=None, names=["record", "label"],
    )
    ref = ref[ref["label"] != "~"]
    mapping = (
        {"N": 0, "A": 1, "O": 2} if multiclass else {"N": 0, "A": 1, "O": 1}
    )
    ref = ref[ref["label"].isin(mapping)]
    return pd.DataFrame(
        {
            "record": [
                os.path.join(physionet_dir, data_subdir, r)
                for r in ref["record"]
            ],
            "label": ref["label"].map(mapping).astype(np.int64).to_numpy(),
        }
    )
