"""Native (C++) execution re-solver bindings.

The TPU emulates float64 in software (~14x the f32 op cost measured on the
exec re-solve, outputs/exec_ab.json), while the host CPU does it natively —
so the ONE f64 consumer on the plan cycle's critical path, the execution
re-solve of the winning scenario tree (reference planner.py:174-178), runs
here as native C++ (exec_ilqr.cpp), a twin of the float64 numpy mirror
(mind_tpu/parity/host_ilqr.py). The f32 bulk pipeline (network, AIME, the
vmapped per-tree solves and selection) stays on the TPU.

No pybind11 in this image: the library is a plain `extern "C"` shared object
loaded through ctypes. It is built on demand with g++ (one ~2 s compile,
cached next to the source); IEEE-strict flags (`-ffp-contract=off`, no
fast-math) keep the arithmetic bit-compatible with numpy where the operation
order matches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "exec_ilqr.cpp")
_LIB = os.path.join(_DIR, "libmind_exec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

N_PHASE_PARAMS = 42


def _build() -> str:
    """Compile the shared library if missing or older than the source."""
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
           "-std=c++17", _SRC, "-o", _LIB + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native library. Raises on failure —
    callers that want graceful fallback use `available()`."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        up = ctypes.POINTER(ctypes.c_uint8)
        lib.mind_exec_two_phase_solve.restype = ctypes.c_int
        lib.mind_exec_two_phase_solve.argtypes = [
            ctypes.c_int, ip, dp, dp, dp,            # n, parents, prob, ego_mean, ego_cov
            ctypes.c_int, dp, dp, up,                # n_exo, exo_mean, exo_cov, exo_mask
            dp, ctypes.c_int,                        # tgt_pts, n_tgt
            dp, dp, dp,                              # x0, warm_params, full_params
            ctypes.c_double, ctypes.c_double,        # dt, wb
            ctypes.c_int, ctypes.c_int,              # warm/full max iters
            ctypes.c_double, ctypes.c_int,           # rel_tol, n_line_search
            ctypes.c_double,                         # mu_max
            dp, dp, dp,                              # out_xs, out_us, out_info
        ]
        lib.mind_exec_ilqr_solve.restype = ctypes.c_int
        lib.mind_exec_ilqr_solve.argtypes = [
            ctypes.c_int, ip, dp, dp, dp,
            ctypes.c_int, dp, dp, up,
            dp, ctypes.c_int,
            dp, dp, dp,                              # x0, us_init, params
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_double,
            dp, dp, dp,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def pack_phase_params(field_offset, res, grid_n, w_tgt, w_ego,
                      w_ego_cov_offset, w_exo, w_exo_cov_offset,
                      w_exo_cost_offset, w_des_state, des_state, w_state_con,
                      state_lb, state_ub, w_ctrl) -> np.ndarray:
    """Flat 42-double phase-parameter block (layout: exec_ilqr.cpp
    PhaseParams::unpack)."""
    out = np.zeros(N_PHASE_PARAMS, np.float64)
    out[0:2] = np.asarray(field_offset, np.float64)
    out[2] = float(res)
    out[3] = float(grid_n)
    out[4] = float(w_tgt)
    out[5] = float(w_ego)
    out[6] = float(w_ego_cov_offset)
    out[7] = float(w_exo)
    out[8] = float(w_exo_cov_offset)
    out[9] = float(w_exo_cost_offset)
    out[10:16] = np.asarray(w_des_state, np.float64)
    out[16:22] = np.asarray(des_state, np.float64)
    out[22:28] = np.asarray(w_state_con, np.float64)
    out[28:34] = np.asarray(state_lb, np.float64)
    out[34:40] = np.asarray(state_ub, np.float64)
    out[40:42] = np.asarray(w_ctrl, np.float64)
    return out


def pack_cost_params(p, field_offset=None) -> Tuple[np.ndarray, np.ndarray]:
    """CostParams (ops/potential.py) -> (flat phase block, real target-lane
    points [n_tgt, 2]). Accepts device or numpy leaves; `field_offset`
    optionally overrides the per-plan grid origin."""
    seg_mask = np.asarray(p.tgt_seg_mask)
    starts = np.asarray(p.tgt_seg_start, np.float64)
    ends = np.asarray(p.tgt_seg_end, np.float64)
    n_seg = int(seg_mask.sum())
    pts = np.concatenate([starts[:n_seg], ends[n_seg - 1:n_seg]], axis=0) \
        if n_seg else np.zeros((1, 2))
    off = np.asarray(field_offset if field_offset is not None
                     else p.field_offset, np.float64)
    flat = pack_phase_params(
        off, np.asarray(p.res), int(p.grid_n), np.asarray(p.w_tgt),
        np.asarray(p.w_ego), np.asarray(p.w_ego_cov_offset),
        np.asarray(p.w_exo), np.asarray(p.w_exo_cov_offset),
        np.asarray(p.w_exo_cost_offset), np.asarray(p.w_des_state),
        np.asarray(p.des_state), np.asarray(p.w_state_con),
        np.asarray(p.state_lb), np.asarray(p.state_ub), np.asarray(p.w_ctrl))
    return flat, np.ascontiguousarray(pts, np.float64)


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def two_phase_solve(parents, prob, ego_mean, ego_cov, exo_mean, exo_cov,
                    exo_mask, tgt_pts, x0, warm_flat, full_flat, *, dt, wb,
                    warm_max_iterations, max_iterations, rel_tol,
                    n_line_search, mu_max):
    """Native two-phase tree-iLQR over the REAL (unpadded) cost nodes.

    Mirrors HostRefPlanner's per-tree solve (parity/host_planner.py:178-188):
    warm solve from zero controls with the warm-phase cost, full solve from
    the warm controls. Returns (xs [n,6], us [n,2], info dict); the executed
    control is xs[0, 4:6]."""
    lib = load()
    parents = np.ascontiguousarray(parents, np.int32)
    n = len(parents)
    prob = np.ascontiguousarray(prob, np.float64)
    ego_mean = np.ascontiguousarray(ego_mean, np.float64)
    ego_cov = np.ascontiguousarray(ego_cov, np.float64)
    exo_mean = np.ascontiguousarray(exo_mean, np.float64)
    exo_cov = np.ascontiguousarray(exo_cov, np.float64)
    exo_mask = np.ascontiguousarray(exo_mask, np.uint8)
    tgt_pts = np.ascontiguousarray(tgt_pts, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    n_exo = exo_mean.shape[1] if exo_mean.ndim == 3 else 0

    xs = np.zeros((n, 6), np.float64)
    us = np.zeros((n, 2), np.float64)
    info = np.zeros(4, np.float64)
    rc = lib.mind_exec_two_phase_solve(
        n, parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(prob), _dp(ego_mean), _dp(ego_cov),
        n_exo, _dp(exo_mean), _dp(exo_cov),
        exo_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _dp(tgt_pts), len(tgt_pts),
        _dp(x0), _dp(warm_flat), _dp(full_flat),
        float(dt), float(wb), int(warm_max_iterations), int(max_iterations),
        float(rel_tol), int(n_line_search), float(mu_max),
        _dp(xs), _dp(us), _dp(info))
    if rc != 0:
        raise RuntimeError(f"mind_exec_two_phase_solve failed rc={rc}")
    return xs, us, {"J": float(info[0]), "warm_iterations": int(info[1]),
                    "iterations": int(info[2]),
                    "converged": bool(info[3])}


def ilqr_solve(parents, prob, ego_mean, ego_cov, exo_mean, exo_cov, exo_mask,
               tgt_pts, x0, us_init, params_flat, *, dt, wb, max_iterations,
               rel_tol, n_line_search, mu_max):
    """Single-phase native solve from `us_init` (host_ilqr_solve surface)."""
    lib = load()
    parents = np.ascontiguousarray(parents, np.int32)
    n = len(parents)
    prob = np.ascontiguousarray(prob, np.float64)
    ego_mean = np.ascontiguousarray(ego_mean, np.float64)
    ego_cov = np.ascontiguousarray(ego_cov, np.float64)
    exo_mean = np.ascontiguousarray(exo_mean, np.float64)
    exo_cov = np.ascontiguousarray(exo_cov, np.float64)
    exo_mask = np.ascontiguousarray(exo_mask, np.uint8)
    tgt_pts = np.ascontiguousarray(tgt_pts, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    us_init = np.ascontiguousarray(us_init, np.float64)
    n_exo = exo_mean.shape[1] if exo_mean.ndim == 3 else 0

    xs = np.zeros((n, 6), np.float64)
    us = np.zeros((n, 2), np.float64)
    info = np.zeros(4, np.float64)
    rc = lib.mind_exec_ilqr_solve(
        n, parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(prob), _dp(ego_mean), _dp(ego_cov),
        n_exo, _dp(exo_mean), _dp(exo_cov),
        exo_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _dp(tgt_pts), len(tgt_pts),
        _dp(x0), _dp(us_init), _dp(params_flat),
        float(dt), float(wb), int(max_iterations), float(rel_tol),
        int(n_line_search), float(mu_max),
        _dp(xs), _dp(us), _dp(info))
    if rc != 0:
        raise RuntimeError(f"mind_exec_ilqr_solve failed rc={rc}")
    return xs, us, {"J": float(info[0]), "iterations": int(info[1]),
                    "converged": bool(info[3])}
