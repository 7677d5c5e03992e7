"""OCR field extraction, EDA utilities, profiler probes."""

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ecgmm_tpu.tools import eda, ocr
from ecgmm_tpu.train import profiler

SAMPLE_OCR_TEXT = """
건강검진 결과통보서
연령 : 63세
성별 : 여
키 / 몸무게
165.2
58.4
고혈압 여부
120 / 80
혈색소
13.5
공복혈당 98
총콜레스테롤
201
HDL 55
중성지방 140
LDL 118
AST 22
ALT 19
감마지티피 31
크레아티닌 0.8
흡연 : 피움
음주 : 안마심
"""


def test_ocr_extract_fields():
    f = ocr.extract_fields(SAMPLE_OCR_TEXT)
    assert f["연령"] == 63
    assert f["성별"] == 1
    assert f["키"] == "165.2" and f["몸무게"] == "58.4"
    assert f["수축기"] == "120" and f["이완기"] == "80"
    assert f["공복혈당"] == "98"
    assert f["고밀도 콜레스테롤"] == "55"
    assert f["AST"] == "22" and f["ALT"] == "19"
    assert f["혈청 크레아티닌"] == "0.8"
    assert f["흡연"] == 1 and f["음주"] == 0


def test_ocr_fields_to_row():
    row = ocr.fields_to_row(ocr.extract_fields(SAMPLE_OCR_TEXT))
    assert row["AGE"] == 63.0
    assert row["Wt"] == 58.4
    assert row["Sex"] == 1.0
    assert row["Cr"] == 0.8


def test_cohort_table(rng):
    df = pd.DataFrame(
        {
            "label": rng.integers(0, 2, 120),
            "AGE": rng.normal(60, 10, 120),
            "Wt": rng.normal(70, 12, 120),
            "Sex": rng.integers(0, 2, 120),
        }
    )
    df.loc[:5, "AGE"] = np.nan
    table = eda.cohort_table(df, "label", ["AGE", "Wt"], ["Sex"])
    assert set(table["variable"]) == {"AGE", "Wt", "Sex"}
    age_row = table[table["variable"] == "AGE"].iloc[0]
    assert 0 < age_row["missing_%"] < 10
    assert 0 <= age_row["p_value"] <= 1


def test_ptbxl_label_stats():
    mani = pd.DataFrame({"label": [1, 0, 0, 0, 1]})
    meta = pd.DataFrame(
        {"age": [70, 55, 60, 58, 75], "weight": [80, 70, 72, 68, 85]}
    )
    out = eda.ptbxl_label_stats(mani, meta)
    assert out["n"] == 5 and out["afib_ratio"] == 0.4
    assert "age_ttest_p" in out


def test_profiler_probes():
    x = jnp.ones((128, 128))
    flops = profiler.compiled_flops(lambda a: a @ a, x)
    assert flops is None or flops >= 2 * 128 ** 3 * 0.5
    assert profiler.live_buffer_bytes() > 0
    stats = profiler.device_memory_stats()
    assert "live_buffer_bytes" in stats


def test_step_timer():
    t = profiler.StepTimer(warmup=1)
    for _ in range(4):
        with t:
            sum(range(1000))
    assert np.isfinite(t.samples_per_sec(32))


def test_ocr_reference_semantics():
    """Round-3 review findings vs the reference extractor (ocr.py:44-172):
    4+-digit values survive whole, values above their keyword are found,
    the hemoglobin decimal correction applies, a keyword heading with no
    nearby number doesn't end the search, and checkbox lifestyle lines
    map to the reference's 0/1/2 codes."""
    text = (
        "혈색소 135 13.5\n"      # dotless first grab → corrected to 13.5
        "흡연 이력\n"
        "☑ 현재 흡연자\n"        # → 2
        "음주\n"
        "■ 비음주자\n"           # → 0
        "운동\n"
        "✅ 건강증진 실천\n"      # → 2
        "1250\n"
        "중성지방\n"             # value on the line ABOVE the keyword
    )
    f = ocr.extract_fields(text)
    assert f["중성지방"] == "1250"
    assert f["혈색소"] == "13.5"
    assert f["흡연"] == 2 and f["음주"] == 0 and f["운동"] == 2

    # a heading mention with no nearby number must not stop the scan
    lines = ["혈당 검사 안내"] + ["-"] * 5 + ["공복혈당 105"]
    f2 = ocr.extract_fields("\n".join(lines))
    assert f2["공복혈당"] == "105"

    # 4-digit value on the keyword line itself
    assert ocr.extract_fields("중성지방 1250\n")["중성지방"] == "1250"
