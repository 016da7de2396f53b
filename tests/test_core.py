"""Unit tests: packing, PWM quantization, scoring matrices (SURVEY.md §4.2)."""

import numpy as np

from gnumap_tpu.align import scoring
from gnumap_tpu.config import PWM_SCALE, S_SCALE, MapperConfig
from gnumap_tpu.core import packing, pwm


def test_encode_decode_roundtrip():
    s = "ACGTNacgtNX"
    codes = packing.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
    assert packing.decode(codes) == "ACGTNACGTNN"


def test_revcomp():
    assert packing.decode(packing.revcomp(packing.encode("ACGTN"))) == "NACGT"
    c = packing.encode("GATTACA")
    assert np.array_equal(packing.revcomp(packing.revcomp(c)), c)


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 100).astype(np.int8)
    assert np.array_equal(packing.unpack_2bit(packing.pack_2bit(codes), 100),
                          codes)


def test_kmer_codes():
    codes = packing.encode("ACGTA")
    km, valid = packing.kmer_codes(codes, 3)
    # ACG = 0*16+1*4+2 = 6; CGT = 1*16+2*4+3 = 27; GTA = 2*16+3*4+0 = 44
    assert list(km) == [6, 27, 44]
    assert valid.all()
    km, valid = packing.kmer_codes(packing.encode("ACNTA"), 3)
    assert list(valid) == [False, False, False]


def test_pwm_rows_sum_to_scale():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, 500).astype(np.int8)
    quals = rng.integers(2, 41, 500)
    pq = pwm.pwm_from_calls(codes, quals)
    assert (pq.sum(axis=-1) == PWM_SCALE).all()
    assert (pq >= 0).all()
    # called base should carry the most mass for decent quality
    good = codes < 4
    assert (np.argmax(pq[good], axis=-1) == codes[good]).all()


def test_pwm_from_probs_renormalizes():
    p = np.array([[0.2, 0.2, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0],
                  [2.0, 1.0, 1.0, 0.0]])
    pq = pwm.pwm_from_probs(p)
    assert (pq.sum(axis=-1) == PWM_SCALE).all()
    assert pq[0, 0] == PWM_SCALE // 4
    assert pq[1, 0] == PWM_SCALE // 4          # all-zero row -> uniform
    assert pq[2, 0] == PWM_SCALE // 2


def test_pwm_revcomp_swaps_bases_and_positions():
    pq = pwm.pwm_from_calls(packing.encode("AAC"), np.array([30, 30, 30]))
    rc = pwm.pwm_revcomp(pq)
    # rc read = GTT: position 0 is complement of position 2
    assert np.array_equal(rc[0], pq[2][::-1])
    assert np.argmax(rc[0]) == 2  # G


def test_normal_matrix_defaults():
    cfg = MapperConfig()
    S = scoring.normal_matrix(cfg)
    assert S[0, 0] == S_SCALE and S[3, 3] == S_SCALE
    assert S[0, 1] == -S_SCALE and S[2, 4] == -S_SCALE


def test_bisulfite_asymmetry():
    cfg = MapperConfig(bisulfite=True)
    Sp, Sm = scoring.matrices_for_mode(cfg)
    assert Sp[3, 1] == S_SCALE      # read T / genome C is a match on +
    assert Sp[1, 3] == -S_SCALE     # but not the converse
    assert Sm[0, 2] == S_SCALE      # read A / genome G is a match on -
    assert Sm[2, 0] == -S_SCALE


def test_emission_exactness():
    rng = np.random.default_rng(2)
    pq = pwm.pwm_from_calls(rng.integers(0, 4, 50).astype(np.int8),
                            rng.integers(2, 41, 50))
    S = scoring.normal_matrix(MapperConfig())
    E = scoring.emission_int(pq, S)
    assert E.dtype == np.int32
    # perfect-match emission of a confident base ~ PWM_SCALE * S_SCALE
    assert E.max() <= PWM_SCALE * S_SCALE
    ref = pq.astype(object) @ S.astype(object)   # arbitrary precision
    assert np.array_equal(E.astype(object), ref)
