"""ctypes bindings to the native CSV parser (native/csv_parser.cpp).

Builds the shared library on first use if g++ is available; falls back to the
pure-Python reader otherwise (amid_tpu.data.packed.read_dual_domain_csv).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libamid_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:  # noqa: BLE001 — fall back to python parser
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.amid_parse.restype = ctypes.c_void_p
    lib.amid_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.amid_num_rows.restype = ctypes.c_int64
    lib.amid_num_rows.argtypes = [ctypes.c_void_p]
    lib.amid_seq_total.restype = ctypes.c_int64
    lib.amid_seq_total.argtypes = [ctypes.c_void_p, ctypes.c_int]
    for name in ("amid_users", "amid_seq_offsets", "amid_seq_values"):
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_int64)
    for name in ("amid_domains", "amid_ob_labels"):
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_int32)
    lib.amid_users.argtypes = [ctypes.c_void_p]
    lib.amid_domains.argtypes = [ctypes.c_void_p]
    lib.amid_ob_labels.argtypes = [ctypes.c_void_p]
    lib.amid_seq_offsets.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.amid_seq_values.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.amid_free.argtypes = [ctypes.c_void_p]
    # full native pack (parse handle -> PackedDualDomainDataset arrays)
    lib.amid_pack.restype = ctypes.c_void_p
    lib.amid_pack.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
    ]
    lib.amid_packed_n.restype = ctypes.c_int64
    lib.amid_packed_n.argtypes = [ctypes.c_void_p]
    for name in ("amid_packed_r_width", "amid_packed_p_width"):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.amid_packed_pool_size.restype = ctypes.c_int32
    lib.amid_packed_pool_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.amid_packed_arr.restype = ctypes.POINTER(ctypes.c_int32)
    lib.amid_packed_arr.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.amid_packed_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def pack_csv_native(path: str, with_ob_label: bool, seq_len: int,
                    pad_id: int, long_length: int):
    """CSV -> PackedDualDomainDataset entirely in C++ (parse + pack): the
    old binding's ctypes lists-of-lists reboxing plus the python pack loop
    cost ~44x the native parse alone (70+370 ms vs ~10 ms on the 27k-row
    mybank split), so parse+pack moved fully into C++; end to end the
    native path is 4.3-8.3x the pure-python path (tools/bench_parser.py
    table). Returns None when the native lib is unavailable (caller falls
    back to the python path)."""
    lib = _load()
    if lib is None:
        return None
    h = lib.amid_parse(str(path).encode(), 1 if with_ob_label else 0)
    if not h:
        return None
    try:
        hp = lib.amid_pack(h, seq_len, pad_id, long_length)
        if not hp:
            return None
        try:
            n = int(lib.amid_packed_n(hp))
            rw = int(lib.amid_packed_r_width(hp))
            pw = int(lib.amid_packed_p_width(hp))

            def arr(name, shape):
                ptr = lib.amid_packed_arr(hp, name.encode())
                flat = int(np.prod(shape))
                return np.ctypeslib.as_array(ptr, (flat,)).reshape(shape).copy()

            from amid_tpu.data.packed import PackedDualDomainDataset

            return PackedDualDomainDataset(
                user=arr("user", (n,)),
                target=arr("target", (n,)),
                seq_d1=arr("seq1", (n, seq_len)),
                seq_d2=arr("seq2", (n, seq_len)),
                long_mask_d1=arr("long1", (n,)),
                long_mask_d2=arr("long2", (n,)),
                domain_id=arr("domain", (n,)),
                overlap=arr("overlap", (n,)),
                ob_label=arr("ob", (n,)),
                reject=arr("reject", (n, rw)),
                reject_counts=arr("reject_counts", (n,)),
                pools=arr("pools", (2, pw)),
                pool_sizes=np.array(
                    [lib.amid_packed_pool_size(hp, 0),
                     lib.amid_packed_pool_size(hp, 1)], dtype=np.int32,
                ),
                pad_id=pad_id,
                seq_len=seq_len,
            )
        finally:
            lib.amid_packed_free(hp)
    finally:
        lib.amid_free(h)


def parse_csv_native(path: str, with_ob_label: bool):
    """Returns (users, seq_d1, seq_d2, domains, ob_labels) as python lists
    (lists-of-lists for the sequences), or None if the native lib is
    unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        return None
    h = lib.amid_parse(str(path).encode(), 1 if with_ob_label else 0)
    if not h:
        return None
    try:
        n = lib.amid_num_rows(h)
        users = np.ctypeslib.as_array(lib.amid_users(h), (n,)).tolist()
        domains = np.ctypeslib.as_array(lib.amid_domains(h), (n,)).tolist()
        ob = (
            np.ctypeslib.as_array(lib.amid_ob_labels(h), (n,)).tolist()
            if with_ob_label
            else []
        )
        seqs = []
        for which in (0, 1):
            total = lib.amid_seq_total(h, which)
            offsets = np.ctypeslib.as_array(lib.amid_seq_offsets(h, which), (n + 1,))
            values = np.ctypeslib.as_array(
                lib.amid_seq_values(h, which), (max(int(total), 1),)
            )
            seqs.append(
                [values[offsets[i]:offsets[i + 1]].tolist() for i in range(n)]
            )
        return users, seqs[0], seqs[1], domains, ob
    finally:
        lib.amid_free(h)
