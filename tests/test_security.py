"""Estimator-anchored security model (utils/security.py): exactness at the
HEstd v1.1 anchors and agreement with published lattice-estimator outputs."""

import pytest

from hehub_tpu.utils import security as sec


def test_hestd_anchor_rows_exact():
    # by construction the model reproduces every standard-table cell
    for n, logqs in sec.HESTD_TERNARY_CLASSICAL.items():
        for logq, lam in zip(logqs, (128, 192, 256)):
            got = sec.rlwe_budget_security_bits(n, logq)
            assert got == pytest.approx(lam, abs=1e-6), (n, logq)


def test_published_crosschecks():
    # TFHE-rs gaussian gate set (targets 2^-128): n=742, q=2^64, σ=2^46.1
    assert sec.ternary_lwe_security_bits(742, 2.0**64, 2.0**46.1) == \
        pytest.approx(128, abs=4)
    # original TFHE gate params: n=630, q=2^32, σ=2^17 (~128-bit claim)
    assert sec.ternary_lwe_security_bits(630, 2.0**32, 2.0**17) == \
        pytest.approx(128, abs=5)


def test_monotonicity():
    # more noise/modulus headroom -> monotone security movement
    q = 2.0**30
    assert sec.ternary_lwe_security_bits(1024, q, 3.2) < \
        sec.ternary_lwe_security_bits(2048, q, 3.2)
    assert sec.ternary_lwe_security_bits(1024, q, 3.2) < \
        sec.ternary_lwe_security_bits(1024, q, 2.0**10)
    assert sec.ternary_lwe_security_bits(1024, 2.0**40, 3.2) < \
        sec.ternary_lwe_security_bits(1024, 2.0**30, 3.2)


def test_preset_security_docstring_numbers():
    """The numbers cited in models/tfhe.py's preset comment block."""
    from hehub_tpu.models import tfhe

    p = tfhe.PRESET_GATE_128
    lwe = sec.ternary_lwe_security_bits(p.lwe_dimension, p.q,
                                        p.lwe_noise_std)
    rlwe = sec.ternary_lwe_security_bits(p.rlwe_dimension, p.q, 3.2)
    assert lwe == pytest.approx(141.1, abs=0.5)
    assert rlwe == pytest.approx(246.0, abs=0.5)
    assert p.security_bits() == pytest.approx(min(lwe, rlwe), abs=1e-9)
    # the toy preset must self-report as insecure
    assert tfhe.PRESET_TOY.security_bits() < 64
