"""ctypes binding for the native host engine (libkt_host.so).

Builds the library on first import if it is missing (requires g++; the
library is a plain C-ABI shared object, no Python build deps).
"""

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libkt_host.so")

_i8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _build():
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


@lru_cache(maxsize=1)
def lib() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        _build()
    else:
        # rebuild if sources are newer
        src_dir = os.path.join(_DIR, "src")
        lib_mtime = os.path.getmtime(_LIB_PATH)
        for f in os.listdir(src_dir):
            if os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime:
                _build()
                break
    L = ctypes.CDLL(_LIB_PATH)

    L.kt_bpm_block.restype = ctypes.c_int32
    L.kt_bpm_block.argtypes = [_i8p, _i8p, ctypes.c_int32, ctypes.c_int32]

    L.kt_edit_oracle.restype = ctypes.c_int32
    L.kt_edit_oracle.argtypes = [_i8p, _i8p, ctypes.c_int32, ctypes.c_int32]

    L.kt_dist_to_anchors.restype = None
    L.kt_dist_to_anchors.argtypes = [
        _i8p, _i64p, _i32p, ctypes.c_int32, _i32p, ctypes.c_int32,
        _f32p, ctypes.c_int32,
    ]

    L.kt_build_tree.restype = ctypes.c_int32
    L.kt_build_tree.argtypes = [
        _i8p, _i64p, _i32p, ctypes.c_int32, _f32p, ctypes.c_int32,
        _i32p, _f32p,
    ]

    L.kt_build_tree_pairwise.restype = ctypes.c_int32
    L.kt_build_tree_pairwise.argtypes = [_f32p, ctypes.c_int32, _i32p, _f32p]

    L.kt_align_msa.restype = ctypes.c_int32
    L.kt_align_msa.argtypes = [
        _i8p, _i64p, _i32p, ctypes.c_int32,             # seqs
        _i32p, ctypes.c_int32,                          # tasks
        _f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # subm, gpo/gpe/tgpe
        ctypes.c_float, ctypes.c_float, ctypes.c_float,  # dist_scale, vsm, weights
        ctypes.c_void_p,                                # seq_distances (or None)
        ctypes.c_void_p,                                # cons_seq_distances (or None)
        ctypes.c_int32, ctypes.c_float,                 # consistency
        ctypes.c_int32, ctypes.c_int32,                 # refine, adaptive
        _i32p, _f32p, ctypes.c_int32,                   # gaps_out, conf_out, threads
    ]

    L.kt_consensus_columns.restype = ctypes.c_int32
    L.kt_consensus_columns.argtypes = [
        _i32p, ctypes.c_int32, _i64p, _i64p, _i32p, ctypes.c_int64, _i32p,
    ]

    L.kt_aln_pairwise_dist.restype = None
    L.kt_aln_pairwise_dist.argtypes = [_i8p, ctypes.c_int32, ctypes.c_int32, _f32p]

    # --- single-merge differential oracle (kt_single.cpp) ---
    L.kt_run_align_single.restype = ctypes.c_int32
    L.kt_run_align_single.argtypes = [
        ctypes.c_int32,                                  # mode
        ctypes.c_void_p, ctypes.c_void_p,                # seq1, seq2
        ctypes.c_void_p, ctypes.c_void_p,                # prof1, prof2
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # len_a, len_b, sip
        _f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # subm, g*
        ctypes.c_float,                                  # soff
        ctypes.c_void_p, ctypes.c_int64,                 # bonus, bstride
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,  # flip thr/trial/stride
        ctypes.c_uint32,                                 # flip_mask
        _i32p, _f32p,                                    # path_out, info_out
    ]
    L.kt_leaf_profile.restype = None
    L.kt_leaf_profile.argtypes = [
        _f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        _i8p, ctypes.c_int32, _f32p,
    ]
    L.kt_scale_gaps.restype = None
    L.kt_scale_gaps.argtypes = [_f32p, ctypes.c_int32, ctypes.c_int32]
    L.kt_merge_profiles.restype = ctypes.c_int32
    L.kt_merge_profiles.argtypes = [
        _f32p, _f32p, _f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, _f32p,
    ]

    # --- pluggable DP backend ---
    L.kt_set_dp_hook.restype = None
    L.kt_set_dp_hook.argtypes = [ctypes.c_void_p]
    L.kt_set_pairwise_hook.restype = None
    L.kt_set_pairwise_hook.argtypes = [ctypes.c_void_p]
    L.kt_set_merge_batch_hook.restype = None
    L.kt_set_merge_batch_hook.argtypes = [ctypes.c_void_p]
    L.kt_set_trial_batch_hook.restype = None
    L.kt_set_trial_batch_hook.argtypes = [ctypes.c_void_p]
    return L


# DP-hook callback prototype (kt_api.h kt_dp_fn).  Raw pointers; the
# Python side wraps them with np.ctypeslib.as_array at known sizes.
DP_HOOK_TYPE = ctypes.CFUNCTYPE(
    ctypes.c_int32,
    ctypes.c_int32,                                  # mode
    ctypes.c_void_p, ctypes.c_void_p,                # seq1, seq2
    ctypes.c_void_p, ctypes.c_void_p,                # prof1, prof2
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # len_a, len_b, sip
    ctypes.c_void_p,                                 # subm
    ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # g*, soff
    ctypes.c_void_p, ctypes.c_int64,                 # bonus, bstride
    ctypes.c_float, ctypes.c_int32, ctypes.c_int32,  # flip thr/trial/stride
    ctypes.c_void_p, ctypes.c_void_p,                # path_out, info_out
    ctypes.c_void_p, ctypes.c_int32,                 # margins_out, margins_cap
)


def set_dp_hook(cb):
    """Install a DP_HOOK_TYPE callback (or None to clear).  The caller
    must keep a reference to the callback object alive while set."""
    if cb is None:
        lib().kt_set_dp_hook(None)
    else:
        lib().kt_set_dp_hook(ctypes.cast(cb, ctypes.c_void_p))


# Batched consistency pairwise backend (kt_api.h kt_pairwise_fn).
PAIRWISE_HOOK_TYPE = ctypes.CFUNCTYPE(
    ctypes.c_int32,
    ctypes.c_int32,                                  # n_pairs
    ctypes.POINTER(ctypes.c_void_p),                 # seqs_a
    ctypes.POINTER(ctypes.c_int32),                  # lens_a
    ctypes.POINTER(ctypes.c_void_p),                 # seqs_b
    ctypes.POINTER(ctypes.c_int32),                  # lens_b
    ctypes.c_void_p,                                 # subm
    ctypes.c_float, ctypes.c_float, ctypes.c_float,  # gpo/gpe/tgpe
    ctypes.c_void_p, ctypes.c_int64,                 # paths_out, stride
)


MERGE_BATCH_HOOK_TYPE = ctypes.CFUNCTYPE(
    ctypes.c_int32,
    ctypes.c_int32,                                  # n
    ctypes.POINTER(ctypes.c_int32),                  # modes
    ctypes.POINTER(ctypes.c_void_p),                 # seqs_a
    ctypes.POINTER(ctypes.c_void_p),                 # seqs_b
    ctypes.POINTER(ctypes.c_void_p),                 # profs_a
    ctypes.POINTER(ctypes.c_void_p),                 # profs_b
    ctypes.POINTER(ctypes.c_int32),                  # lens_a
    ctypes.POINTER(ctypes.c_int32),                  # lens_b
    ctypes.POINTER(ctypes.c_int32),                  # sips
    ctypes.POINTER(ctypes.c_void_p),                 # bonuses
    ctypes.POINTER(ctypes.c_int64),                  # bstrides
    ctypes.POINTER(ctypes.c_float),                  # gpos
    ctypes.POINTER(ctypes.c_float),                  # gpes
    ctypes.POINTER(ctypes.c_float),                  # tgpes
    ctypes.POINTER(ctypes.c_float),                  # soffs
    ctypes.c_void_p,                                 # subm
    ctypes.c_void_p, ctypes.c_int64,                 # paths_out, stride
    ctypes.c_void_p, ctypes.c_void_p,                # margin_sums, counts
)


def set_merge_batch_hook(cb):
    if cb is None:
        lib().kt_set_merge_batch_hook(None)
    else:
        lib().kt_set_merge_batch_hook(ctypes.cast(cb, ctypes.c_void_p))


TRIAL_BATCH_HOOK_TYPE = ctypes.CFUNCTYPE(
    ctypes.c_int32,
    ctypes.c_int32,                                  # mode
    ctypes.c_void_p, ctypes.c_void_p,                # seq1, seq2
    ctypes.c_void_p, ctypes.c_void_p,                # prof1, prof2
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # len_a, len_b, sip
    ctypes.c_void_p,                                 # subm
    ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # g*, soff
    ctypes.c_void_p, ctypes.c_int64,                 # bonus, bstride
    ctypes.c_int32, ctypes.c_float, ctypes.c_int32,  # n_trials, thr, stride
    ctypes.c_void_p, ctypes.c_int64,                 # paths_out, path_stride
    ctypes.c_void_p, ctypes.c_void_p,                # margin_sums, counts
)


def set_trial_batch_hook(cb):
    if cb is None:
        lib().kt_set_trial_batch_hook(None)
    else:
        lib().kt_set_trial_batch_hook(ctypes.cast(cb, ctypes.c_void_p))


def set_pairwise_hook(cb):
    if cb is None:
        lib().kt_set_pairwise_hook(None)
    else:
        lib().kt_set_pairwise_hook(ctypes.cast(cb, ctypes.c_void_p))


def flatten_seqs(codes_list):
    """Pack a list of uint8 arrays into (flat, offsets, lens)."""
    lens = np.array([len(c) for c in codes_list], dtype=np.int32)
    offsets = np.zeros(len(codes_list), dtype=np.int64)
    total = 0
    for i, c in enumerate(codes_list):
        offsets[i] = total
        total += len(c)
    flat = np.empty(total, dtype=np.uint8)
    for i, c in enumerate(codes_list):
        flat[offsets[i]:offsets[i] + len(c)] = c
    return flat, offsets, lens
