"""TFHE gate-bootstrapping demo — the feature the reference only declares
(≙ /root/reference/src/fhe/tfhe/func_boot.h:40-89, implementation absent).

Evaluates a bootstrapped NAND truth table over batched LWE ciphertexts: all
four input pairs run through ONE batched blind rotation (the batch dimension
rides through the jax scan), which is how TFHE gates amortize on wide
hardware.

Usage: python examples/tfhe_example.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from hehub_tpu.models import tfhe


def main(secure: bool = False):
    # named presets with documented security estimates (models/tfhe.py):
    # PRESET_TOY is fast for a demo but NOT secure; pass "secure" on the
    # command line for the ~128-bit production preset.
    params = tfhe.PRESET_GATE_128 if secure else tfhe.PRESET_TOY
    print(f"preset: N={params.rlwe_dimension}, m={params.lwe_dimension}, "
          f"estimated security ≈ {params.security_bits():.0f} bits"
          + ("" if secure else "  (TOY parameters — do not deploy)"))
    keys = tfhe.keygen(params, jax.random.key(0))

    bits1 = np.array([0, 0, 1, 1], np.uint32)
    bits2 = np.array([0, 1, 0, 1], np.uint32)
    ct1 = tfhe.lwe_encrypt(params, tfhe.encode_bit(params, bits1),
                           keys.lwe_s, jax.random.key(1))
    ct2 = tfhe.lwe_encrypt(params, tfhe.encode_bit(params, bits2),
                           keys.lwe_s, jax.random.key(2))

    t0 = time.perf_counter()
    out = tfhe.nand_gate(params, ct1, ct2, keys)
    got = np.asarray(tfhe.lwe_decrypt_bit(params, out, keys.lwe_s))
    dt = time.perf_counter() - t0

    want = 1 - (bits1 & bits2)
    print(f"NAND({bits1}, {bits2}) = {got}  expected {want}  "
          f"[4 bootstrapped gates in {dt:.2f}s]")
    assert np.array_equal(got, want)


if __name__ == "__main__":
    main(secure="secure" in sys.argv[1:])
