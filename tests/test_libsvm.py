"""LIBSVM parser: python backend, native C backend, compressed files."""

import bz2

import numpy as np
import pytest

from krylov_crn_tpu.data.libsvm import load_libsvm, parse_libsvm_bytes

SAMPLE = b"""# a comment line
+1 1:0.5 3:-2.25 7:1e-3
-1 2:4 7:0.125

-1 1:1.0   3:2.5 # trailing comment
+1 4:-0.75
"""


def _expected():
    dense = np.zeros((4, 7))
    dense[0, 0], dense[0, 2], dense[0, 6] = 0.5, -2.25, 1e-3
    dense[1, 1], dense[1, 6] = 4.0, 0.125
    dense[2, 0], dense[2, 2] = 1.0, 2.5
    dense[3, 3] = -0.75
    labels = np.array([1.0, -1.0, -1.0, 1.0])
    return dense, labels


@pytest.mark.parametrize("backend", ["python", "native"])
def test_parse_sample(backend):
    if backend == "native":
        pytest.importorskip("ctypes")
        try:
            from krylov_crn_tpu.native import libsvm_native

            libsvm_native._load()
        except Exception as e:  # no toolchain
            pytest.skip(f"native build unavailable: {e}")
    A, b = parse_libsvm_bytes(SAMPLE, backend=backend)
    dense, labels = _expected()
    np.testing.assert_allclose(A.toarray(), dense)
    np.testing.assert_array_equal(b, labels)


def test_backends_agree_on_random():
    try:
        from krylov_crn_tpu.native import libsvm_native

        libsvm_native._load()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(200):
        label = rng.choice([-1, 1])
        idxs = np.sort(rng.choice(500, size=rng.integers(0, 20),
                                  replace=False)) + 1
        toks = " ".join(f"{j}:{rng.standard_normal():.6g}" for j in idxs)
        lines.append(f"{label} {toks}")
    data = ("\n".join(lines) + "\n").encode()
    A1, b1 = parse_libsvm_bytes(data, backend="python")
    A2, b2 = parse_libsvm_bytes(data, backend="native")
    np.testing.assert_array_equal(b1, b2)
    assert (A1 != A2).nnz == 0


def test_load_bz2(tmp_path):
    p = tmp_path / "tiny.bz2"
    p.write_bytes(bz2.compress(SAMPLE))
    A, b = load_libsvm(str(p))
    dense, labels = _expected()
    np.testing.assert_allclose(A.toarray(), dense)
    np.testing.assert_array_equal(b, labels)


def test_missing_no_download():
    with pytest.raises(FileNotFoundError):
        load_libsvm("definitely_not_here.binary", allow_download=False)


def test_zero_based_detection():
    # a 0 index forces zero_based
    A, b = parse_libsvm_bytes(b"1 0:2.0 3:1.0\n-1 1:5.0\n")
    assert A.shape == (2, 4)
    assert A[0, 0] == 2.0 and A[0, 3] == 1.0 and A[1, 1] == 5.0
