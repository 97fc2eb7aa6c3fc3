"""Frame-for-frame parity with the compiled C reference at matched seeds.

tests/golden/sc128_frames.txt is the per-frame dump (payload u, received y,
decoded u_hat) of the reference SC_128.c (seed 1024, Eb/N0 = 1.0 dB, first 8
frames), produced by a patched copy fed our F^{tensor n} on stdin.  This
validates the exact-parity chain end to end (SURVEY §7.7 golden mode):

  Ranq1 + Marsaglia-polar port (utils/rng.py)  ->  bit-exact y
  PN payload window (utils/pn.py)              ->  bit-exact u
  oracle SC decode (reference_impl)            ->  bit-exact u_hat
"""
import os

import numpy as np

from polardecoding_tpu.utils.pn import payload_bits_host
from polardecoding_tpu.utils.rng import golden_noise
from polardecoding_tpu.utils.sequences import frozen_mask, info_set
from polardecoding_tpu.utils.gf2 import dense_generator, encode_dense

import reference_impl as ref

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sc128_frames.txt")
N, K = 128, 64
SNR_DB = 1.0
SEED = 1024


def _load(path=None):
    frames = {}
    with open(path or GOLDEN) as f:
        for line in f:
            parts = line.split()
            if parts[0] != "FRAME":
                continue
            run, kind = int(parts[1]), parts[2]
            vals = parts[3:]
            frames.setdefault(run, {})[kind] = (
                np.array([float(v) for v in vals])
                if kind == "Y"
                else np.array([int(v) for v in vals], dtype=np.int8)
            )
    return frames


def test_golden_frames_match_c_reference():
    frames = _load()
    assert len(frames) == 8
    sigma = 10.0 ** (-SNR_DB / 20.0)
    I = info_set(N, K)
    frozen = frozen_mask(N, K)
    G = dense_generator(N)
    noise = golden_noise(SEED, len(frames), N, sigma)
    g = ref.Graph(N, "lee")

    for run in sorted(frames):
        rec = frames[run]
        # payload: PN window at frame index `run`
        u = np.zeros(N, dtype=np.int8)
        u[I] = payload_bits_host(run, K)
        assert (u == rec["U"]).all(), f"frame {run} payload"
        # channel: BPSK + the exact Ranq1/Marsaglia noise stream
        x = encode_dense(u, G)
        y = (1.0 - 2.0 * x.astype(np.float64)) + noise[run]
        np.testing.assert_array_equal(y, rec["Y"], err_msg=f"frame {run} y")
        # decode: channel LLR with the reference's exact expression order
        llr = 2.0 * rec["Y"] / sigma / sigma
        u_hat = ref.sc_decode(g, llr, frozen)
        assert (u_hat == rec["H"]).all(), f"frame {run} u_hat"


def test_engine_matches_golden_frames():
    """The f32 vectorized SC engine on the same received frames."""
    import jax.numpy as jnp

    from polardecoding_tpu.models.sc import sc_decode

    frames = _load()
    sigma = 10.0 ** (-SNR_DB / 20.0)
    frozen = frozen_mask(N, K)
    ys = np.stack([frames[r]["Y"] for r in sorted(frames)])
    want = np.stack([frames[r]["H"] for r in sorted(frames)])
    llr = 2.0 * ys / sigma / sigma
    got = np.asarray(sc_decode(jnp.asarray(llr, jnp.float32), jnp.asarray(frozen)))
    assert (got == want).all()


def _golden_llrs(name):
    frames = _load(os.path.join(os.path.dirname(__file__), "golden", name))
    sigma = 10.0 ** (-SNR_DB / 20.0)
    ys = np.stack([frames[r]["Y"] for r in sorted(frames)])
    want = np.stack([frames[r]["H"] for r in sorted(frames)])
    return 2.0 * ys / sigma / sigma, want


def test_sc_fag_golden_frames():
    """SC_128_fag (Kao graph, seed 1024 in the reference source): the last
    golden gap (round-3 verdict missing #3).  Frame dump from a patched
    /tmp copy of SC_128_fag.c (outer loop pinned to 1.0 dB, inner loop to
    the first 8 frames, FRAME U/Y/H printfs with %.17g after SCdecode;
    stdin = our F^{tensor n} from utils/gf2.dense_generator).  Validates the
    reference's Kao decode-order semantics (SC_128_fag.c:436-448, bRev
    channel assignment :333-358) frame-for-frame: the kao-wired oracle must
    reproduce H bit-exactly, and the Lee-wired oracle + f32 engine must
    agree — the relabeling identity on real reference output, not just on
    our own simulators."""
    import jax.numpy as jnp

    from polardecoding_tpu.models.sc import sc_decode

    frames = _load(os.path.join(os.path.dirname(__file__), "golden",
                                "sc_128_fag_frames.txt"))
    assert len(frames) == 8
    sigma = 10.0 ** (-SNR_DB / 20.0)
    I = info_set(N, K)
    frozen = frozen_mask(N, K)
    G = dense_generator(N)
    noise = golden_noise(SEED, len(frames), N, sigma)
    gkao = ref.Graph(N, "kao")
    glee = ref.Graph(N, "lee")

    for run in sorted(frames):
        rec = frames[run]
        u = np.zeros(N, dtype=np.int8)
        u[I] = payload_bits_host(run, K)
        assert (u == rec["U"]).all(), f"frame {run} payload"
        x = encode_dense(u, G)
        y = (1.0 - 2.0 * x.astype(np.float64)) + noise[run]
        np.testing.assert_array_equal(y, rec["Y"], err_msg=f"frame {run} y")
        llr = 2.0 * rec["Y"] / sigma / sigma
        # the kao-wired oracle models SC_128_fag.c literally
        assert (ref.sc_decode(gkao, llr, frozen) == rec["H"]).all(), run
        # the relabeling identity: the lee wiring decodes the same bits
        assert (ref.sc_decode(glee, llr, frozen) == rec["H"]).all(), run

    ys = np.stack([frames[r]["Y"] for r in sorted(frames)])
    want = np.stack([frames[r]["H"] for r in sorted(frames)])
    llr = 2.0 * ys / sigma / sigma
    got = np.asarray(sc_decode(jnp.asarray(llr, jnp.float32),
                               jnp.asarray(frozen)))
    assert (got == want).all()


def test_bp_golden_frames():
    """BP_128 (patched to seed 1024): oracle (f64, bit-exact) and the
    vectorized engine in f64 vs the C dump.  The f32 engine is not asserted
    frame-for-frame here: BP trajectories on non-converged frames are chaotic
    and precision-sensitive (curve-level f32 equivalence is covered by the
    statistical harness tests and the /verify BLER drive)."""
    import jax
    import jax.numpy as jnp

    from polardecoding_tpu.models.bp import bp_decode

    frames = _load(os.path.join(os.path.dirname(__file__), "golden",
                                "bp_128_frames.txt"))
    sigma = 10.0 ** (-SNR_DB / 20.0)
    llr = np.stack([2.0 * frames[r]["Y"] / sigma / sigma for r in sorted(frames)])
    want = np.stack([frames[r]["H"] for r in sorted(frames)])
    u_true = np.stack([frames[r]["U"] for r in sorted(frames)])
    frozen = frozen_mask(N, K)
    g = ref.Graph(N, "lee")
    # the numpy oracle is bit-exact on ALL frames, converged or not
    for b in range(llr.shape[0]):
        got = ref.bp_decode(g, llr[b], frozen, iters=100)
        assert (got == want[b]).all(), f"frame {b} oracle"
    # the XLA engine contracts mul+add into FMA (the C, built for SSE2, does
    # not), so last-ulp differences diverge CHAOTIC (non-converged) frames;
    # on every frame the C decoded successfully the f64 engine is bit-exact.
    with jax.enable_x64(True):
        got = np.asarray(
            bp_decode(jnp.asarray(llr, jnp.float64), jnp.asarray(frozen), iters=100)
        )
    converged = (want == u_true).all(axis=1)
    assert converged.any()
    assert (got[converged] == want[converged]).all()


def test_scl_golden_frames():
    """SCL_128 L=8 (seed 1024): oracle and f32 engine vs the C dump."""
    import jax.numpy as jnp

    from polardecoding_tpu.models.scl import scl_decode

    llr, want = _golden_llrs("scl_128_frames.txt")
    frozen = frozen_mask(N, K)
    g = ref.Graph(N, "lee")
    for b in range(llr.shape[0]):
        got = ref.scl_decode(g, llr[b], frozen, 8)
        assert (got == want[b]).all(), f"frame {b} oracle"
    got = np.asarray(
        scl_decode(jnp.asarray(llr, jnp.float32), jnp.asarray(frozen), list_size=8)
    )
    assert (got == want).all()


def test_cascl_golden_frames():
    """CASCL_128 L=8 CRC-6 (patched to seed 1024): oracle + engine vs C dump."""
    import jax.numpy as jnp

    from polardecoding_tpu.models.scl import cascl_decode
    from polardecoding_tpu.ops.crc import CRC6_EXPONENTS, check_matrix

    llr, want = _golden_llrs("cascl_128_frames.txt")
    r = max(CRC6_EXPONENTS)
    I = info_set(N, K + r)
    frozen = frozen_mask(N, K + r)
    R = check_matrix(CRC6_EXPONENTS, K + r)
    g = ref.Graph(N, "lee")
    for b in range(llr.shape[0]):
        outs, pm = ref.scl_decode(g, llr[b], frozen, 8, return_state=True)
        ok = [(np.asarray(outs[k][I]) @ R % 2 == 0).all() for k in range(8)]
        if any(ok):
            best = min((k for k in range(8) if ok[k]), key=lambda k: pm[k])
        else:
            best = int(np.argmin(pm))
        assert (outs[best] == want[b]).all(), f"frame {b} oracle"
    got = np.asarray(
        cascl_decode(
            jnp.asarray(llr, jnp.float32), jnp.asarray(frozen), tuple(I), R,
            list_size=8,
        )
    )
    assert (got == want).all()
