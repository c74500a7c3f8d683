'''ctypes bindings for the native (C++) components in native/.

  * fast extxyz parsing (extxyz.cpp) -- production dataset ingestion;
  * cell-list neighbor search (celllist.cpp) -- O(N) host-side neighbor
    lists for very large systems.

Everything degrades gracefully: if the shared library has not been built
(`make -C native`), `available()` is False and callers fall back to the
pure-Python implementations. `ensure_built()` attempts an on-demand build
with the local toolchain.
'''
import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libnewtonnet_native.so')
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    if not (hasattr(lib, 'newton3_half_list')
            and hasattr(lib, 'staircase_color_edges')):
        # stale .so predating newton3.cpp: force a rebuild. dlopen dedups
        # by path, so re-CDLL'ing _LIB_PATH would return the stale handle
        # already loaded above -- load the rebuilt library through a
        # uniquely-named temp copy instead.
        import shutil
        import tempfile
        subprocess.run(['make', '-C', _NATIVE_DIR, '-B'],
                       capture_output=True, check=False)
        with tempfile.NamedTemporaryFile(
                suffix='.so', delete=False) as tmp:
            shutil.copyfile(_LIB_PATH, tmp.name)
            lib = ctypes.CDLL(tmp.name)
        if not (hasattr(lib, 'newton3_half_list')
                and hasattr(lib, 'staircase_color_edges')):
            return None
    lib.xyz_parse.restype = ctypes.c_void_p
    lib.xyz_parse.argtypes = [ctypes.c_char_p]
    lib.xyz_error.restype = ctypes.c_char_p
    lib.xyz_error.argtypes = [ctypes.c_void_p]
    for fn in ('xyz_n_frames', 'xyz_total_atoms'):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ('xyz_has_energy', 'xyz_has_forces'):
        getattr(lib, fn).restype = ctypes.c_uint8
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.xyz_fill.restype = None
    lib.xyz_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
    lib.xyz_free.restype = None
    lib.xyz_free.argtypes = [ctypes.c_void_p]
    lib.cell_list_neighbors.restype = ctypes.c_int64
    lib.cell_list_neighbors.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_double,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.symmetrize_slots.restype = ctypes.c_int64
    lib.symmetrize_slots.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.newton3_half_list.restype = ctypes.c_int64
    lib.newton3_half_list.argtypes = lib.symmetrize_slots.argtypes
    lib.staircase_color_edges.restype = ctypes.c_int64
    lib.staircase_color_edges.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return lib


def available():
    return _load() is not None


def ensure_built(quiet=True):
    '''Build the shared library with `make -C native` if missing.'''
    if available():
        return True
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR],
                       capture_output=quiet, check=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    return available()


def parse_extxyz(path):
    '''Parse an extxyz file natively.

    Returns dict: ptr (n_frames+1,), z (atoms,), pos (atoms, 3),
    forces (atoms, 3) | None, cell (n_frames, 3, 3), energy (n_frames,) |
    None, pbc (n_frames, 3) bool.
    '''
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built (run make -C native)')
    h = lib.xyz_parse(path.encode())
    try:
        err = lib.xyz_error(h)
        if err:
            raise ValueError(f'{path}: {err.decode()}')
        n_frames = lib.xyz_n_frames(h)
        atoms = lib.xyz_total_atoms(h)
        z = np.empty(atoms, np.int32)
        pos = np.empty((atoms, 3), np.float64)
        forces = np.empty((atoms, 3), np.float64)
        cell = np.empty((n_frames, 3, 3), np.float64)
        energy = np.empty(n_frames, np.float64)
        pbc = np.empty((n_frames, 3), np.uint8)
        ptr = np.empty(n_frames + 1, np.int64)
        lib.xyz_fill(h, *(a.ctypes.data_as(ctypes.c_void_p)
                          for a in (z, pos, forces, cell, energy, pbc, ptr)))
        return {
            'ptr': ptr, 'z': z, 'pos': pos,
            'forces': forces if lib.xyz_has_forces(h) else None,
            'cell': cell,
            'energy': energy if lib.xyz_has_energy(h) else None,
            'pbc': pbc.astype(bool),
        }
    finally:
        lib.xyz_free(h)


def cell_list_neighbors(pos, cell, cutoff, k_max):
    '''Native padded neighbor list for one system.

    Args:
        pos: (n, 3) float64 positions (wrapped into the cell if periodic).
        cell: (3, 3) lattice rows or None/zeros for aperiodic.
        cutoff: radius; k_max: neighbor capacity.

    Returns:
        idx (n, k_max) int32, count (n,) int32, overflow (int).
    '''
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built (run make -C native)')
    pos = np.ascontiguousarray(pos, np.float64)
    n = pos.shape[0]
    cell_arr = (np.zeros((3, 3)) if cell is None
                else np.ascontiguousarray(cell, np.float64))
    if cell_arr.any():
        # wrap into the cell so bins and raw distances are consistent
        frac = pos @ np.linalg.inv(cell_arr)
        pos = np.ascontiguousarray((frac - np.floor(frac)) @ cell_arr)
    idx = np.zeros((n, k_max), np.int32)
    count = np.zeros(n, np.int32)
    overflow = lib.cell_list_neighbors(
        pos.ctypes.data_as(ctypes.c_void_p), n,
        cell_arr.ctypes.data_as(ctypes.c_void_p),
        float(cutoff), int(k_max),
        idx.ctypes.data_as(ctypes.c_void_p),
        count.ctypes.data_as(ctypes.c_void_p))
    return idx, count, int(overflow)


def symmetrize_slots_native(idx, kmask, k_out):
    '''Shared-slot re-coloring of one frame's neighbor list (C++).

    idx (N, K) int32, kmask (N, K) bool -> (idx2, kmask2) of shape
    (N, k_out) with every undirected edge at the same slot in both
    endpoint lists (see native/symslots.cpp). Returns None if k_out is
    too small for the greedy coloring (caller should retry larger).
    '''
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built (run make -C native)')
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    kmask = np.ascontiguousarray(kmask, dtype=np.uint8)
    n, k_in = idx.shape
    idx2 = np.zeros((n, k_out), np.int32)
    mask2 = np.zeros((n, k_out), np.uint8)
    slots = lib.symmetrize_slots(
        idx.ctypes.data, kmask.ctypes.data, n, k_in, k_out,
        idx2.ctypes.data, mask2.ctypes.data)
    if slots < 0:
        return None
    return idx2, mask2.astype(bool)


def newton3_half_list_native(idx, kmask, k_out=0):
    '''Newton's-third-law half list of one frame's symmetric neighbor list.

    Orients each undirected edge (Eulerian trails) and Konig-colors the
    oriented edges so no two out-edges of i and no two in-edges of j share
    a slot (native/newton3.cpp; the exactness condition of the model's
    newton3 mode). k_out=0 sizes the output at the Konig optimum
    max(out-degree, in-degree) via a probe call. Returns (idx2, kmask2) of
    shape (N, k2), or None if a requested k_out is too small.
    '''
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built (run make -C native)')
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    kmask = np.ascontiguousarray(kmask, dtype=np.uint8)
    n, k_in = idx.shape
    if k_out <= 0:
        probe_i = np.zeros((n, k_in), np.int32)
        probe_m = np.zeros((n, k_in), np.uint8)
        k_out = int(lib.newton3_half_list(
            idx.ctypes.data, kmask.ctypes.data, n, k_in, k_in,
            probe_i.ctypes.data, probe_m.ctypes.data))
        if k_out < 0:  # cannot happen: half list never needs > k_in slots
            return None
        return probe_i[:, :k_out], probe_m[:, :k_out].astype(bool)
    idx2 = np.zeros((n, k_out), np.int32)
    mask2 = np.zeros((n, k_out), np.uint8)
    slots = lib.newton3_half_list(
        idx.ctypes.data, kmask.ctypes.data, n, k_in, k_out,
        idx2.ctypes.data, mask2.ctypes.data)
    if slots < 0:
        return None
    return idx2, mask2.astype(bool)


def staircase_color_edges_native(idx, kmask, sweeps=6, cap=0):
    '''Staircase color phase of one frame (native/staircase.cpp).

    Orients the symmetric list, Konig-colors it, and runs the dual-side
    Kempe compaction sweeps (ops/staircase.py documents the algorithm);
    ~180x faster than the pure-python phase at N=4096. cap=0 colors into
    the Konig-optimum palette; a larger cap (a dataset shape plan) colors
    into that palette. Returns (src, dst, color) int32 arrays of the m
    oriented half edges, or None when cap is below the Konig optimum.
    '''
    lib = _load()
    if lib is None:
        raise RuntimeError('native library not built (run make -C native)')
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    kmask = np.ascontiguousarray(kmask, dtype=np.uint8)
    n, k_in = idx.shape
    m_cap = int(kmask.sum())  # directed count >= half count
    src = np.zeros(m_cap, np.int32)
    dst = np.zeros(m_cap, np.int32)
    color = np.zeros(m_cap, np.int32)
    m = int(lib.staircase_color_edges(
        idx.ctypes.data, kmask.ctypes.data, n, k_in, sweeps, cap,
        src.ctypes.data, dst.ctypes.data, color.ctypes.data, m_cap))
    if m < 0:
        return None
    return src[:m], dst[:m], color[:m]
