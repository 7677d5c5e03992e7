"""tools/tp_report HLO collective census: shape/byte parsing over
representative optimized-HLO text fragments."""

from ecgmm_tpu.tools.tp_report import collective_volume


HLO = """
ENTRY %main {
  %p0 = f32[8,256]{1,0} parameter(0)
  %ag = f32[8,256,512]{2,1,0} all-gather(%p0), replica_groups={{0,1}}
  %ar = bf16[128]{0} all-reduce(%x), to_apply=%sum
  %cp = u8[4,16]{1,0} collective-permute(%y), source_target_pairs={{0,1}}
  %ag2 = f32[16]{0} all-gather(%z), dimensions={0}
  %dot = f32[8,8]{1,0} dot(%a, %b)
}
"""


def test_collective_volume_counts_and_bytes():
    vol = collective_volume(HLO)
    # two all-gathers: 8*256*512*4 + 16*4 bytes
    cnt, byt = vol["all-gather"]
    assert cnt == 2
    assert byt == 8 * 256 * 512 * 4 + 16 * 4
    cnt, byt = vol["all-reduce"]
    assert cnt == 1 and byt == 128 * 2  # bf16
    cnt, byt = vol["collective-permute"]
    assert cnt == 1 and byt == 4 * 16 * 1  # u8
    # non-collective ops are not counted
    assert "dot" not in vol


def test_collective_volume_variadic_tuple():
    """GSPMD routinely fuses several operands into one variadic
    collective — every tuple element's bytes must count."""
    hlo = ("%v = (f32[8,128]{1,0}, f32[8,512]{1,0}) "
           "all-gather(%a, %b), dimensions={0}")
    cnt, byt = collective_volume(hlo)["all-gather"]
    assert cnt == 1
    assert byt == (8 * 128 + 8 * 512) * 4


def test_collective_volume_async_pairs_count_once():
    """Async collectives appear as -start/-done pairs; the result bytes
    come from the -done, and the pair counts once."""
    hlo = """
  %s = (f32[8,64]{1,0}, f32[8,256]{1,0}) all-gather-start(%a)
  %d = f32[8,256]{1,0} all-gather-done(%s)
  %rs = bf16[32]{0} reduce-scatter(%x), to_apply=%sum
"""
    vol = collective_volume(hlo)
    cnt, byt = vol["all-gather"]
    assert cnt == 1
    assert byt == 8 * 256 * 4
    assert vol["reduce-scatter"] == (1, 32 * 2)


def test_collective_volume_empty():
    assert collective_volume("ENTRY %m { %r = f32[2]{0} add(%a,%b) }") == {}
