"""Native C++ load-path library vs numpy reference: bit-exact equality."""

import numpy as np
import pytest

from tpu_engine.gguf.constants import GGML_BLOCK_INFO
from tpu_engine.native import lib as native
from tpu_engine.quant import formats as F
from tpu_engine.quant.device_format import (
    LAYOUTS,
    permute_group_transpose_i8,
    permute_group_transpose_nib4,
    to_device_format,
)

RNG = np.random.default_rng(21)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.mark.parametrize("ty", list(LAYOUTS))
def test_native_extract_matches_numpy(ty):
    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 32, 4 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32) * 2
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    qs_n, sc_n, b_n = native.extract_device(raw, ty, n, k)
    dq = to_device_format(raw, ty, (n, k))
    if dq.layout.kind == "nib4":
        qs_ref = permute_group_transpose_nib4(dq.qs, dq.layout.group)
    else:
        qs_ref = permute_group_transpose_i8(dq.qs, dq.layout.group)
    np.testing.assert_array_equal(qs_n, qs_ref)
    np.testing.assert_array_equal(sc_n, dq.scale)
    if dq.bias is not None:
        np.testing.assert_array_equal(b_n, dq.bias)
    else:
        assert b_n is None


@pytest.mark.parametrize("ty", list(LAYOUTS))
def test_native_dequant_matches_numpy(ty):
    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 8, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    ref = F.dequantize(raw, ty).reshape(n, k)
    got = native.dequant(raw, ty, n, k)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
