"""Shard IO tests: native/python parity, corruption bounds, merge semantics.

Covers the reference's data-artifact layer (SURVEY.md §3.4: pickle-append
streams + sequential merge) rebuilt as validated native shard files.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from quattro_tpu.io import shardio
from quattro_tpu.io.shardio import (
    ShardReader,
    ShardWriter,
    encode_payload,
    decode_payload,
    index_shard,
    merge_shards,
    native_available,
    read_shard,
)


def _sample_records(n=5, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "x_seq": rng.normal(size=(31, 4)),
            "kk": rng.normal(size=(30, 5)).astype(np.float32),
            "iteration": np.int64(i),
            "cost": np.float64(rng.normal()),
        }
        for i in range(n)
    ]


def _assert_records_equal(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert set(g) == set(w)
        for k in w:
            np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(w[k]))
            assert np.asarray(g[k]).dtype == np.asarray(w[k]).dtype


def test_payload_roundtrip_dtypes_and_shapes():
    rec = {
        "f64": np.arange(6, dtype=np.float64).reshape(2, 3),
        "f32": np.float32(3.5),
        "i32": np.arange(4, dtype=np.int32),
        "bool": np.array([True, False]),
        "empty": np.zeros((0, 7)),
        "scalar0d": np.array(2.0),
    }
    out = decode_payload(memoryview(encode_payload(rec)))
    _assert_records_equal([out], [rec])


def test_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "logs.qtshard")
    records = _sample_records()
    with ShardWriter(path) as w:
        for r in records:
            w.append(r)
    _assert_records_equal(read_shard(path), records)
    # Reader is zero-copy + lazily indexable.
    with ShardReader(path) as r:
        assert len(r) == len(records)
        np.testing.assert_array_equal(r[2]["x_seq"], records[2]["x_seq"])


def test_append_reopen(tmp_path):
    path = str(tmp_path / "logs.qtshard")
    recs = _sample_records(4)
    with ShardWriter(path) as w:
        for r in recs[:2]:
            w.append(r)
    with ShardWriter(path) as w:  # reopen appends, no duplicate magic
        for r in recs[2:]:
            w.append(r)
    _assert_records_equal(read_shard(path), recs)


def test_corrupt_tail_truncates_not_raises(tmp_path):
    """Crash-bounded loss: corruption invalidates only the tail records."""
    path = str(tmp_path / "logs.qtshard")
    recs = _sample_records(3)
    with ShardWriter(path) as w:
        for r in recs:
            w.append(r)
    offsets, lengths = index_shard(path)
    assert len(offsets) == 3
    # Flip a payload byte inside record 1 -> records 1,2 dropped, 0 kept.
    with open(path, "r+b") as f:
        f.seek(offsets[1] + 3)
        b = f.read(1)
        f.seek(offsets[1] + 3)
        f.write(bytes([b[0] ^ 0xFF]))
    _assert_records_equal(read_shard(path), recs[:1])
    # Truncated partial tail behaves the same way.
    with open(path, "r+b") as f:
        f.truncate(offsets[1] + 4)
    _assert_records_equal(read_shard(path), recs[:1])


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.qtshard")
    with open(path, "wb") as f:
        f.write(b"NOTASHRD" + b"\x00" * 64)
    with pytest.raises(ValueError):
        index_shard(path)


def test_corrupt_huge_length_is_truncation_not_crash(tmp_path):
    """A bit-flipped payload_len near UINT64_MAX must read as a corrupt tail
    (records before it kept), not wrap the native scanner's bounds check and
    abort the process via an uncatchable std::bad_alloc."""
    import struct

    path = str(tmp_path / "hugelen.qtshard")
    recs = _sample_records(3)
    with ShardWriter(path) as w:
        for r in recs:
            w.append(r)
    offsets, _ = index_shard(path)
    # Overwrite record 1's length field (8 bytes after the record magic).
    with open(path, "r+b") as f:
        f.seek(offsets[1] - 12)  # header = magic(4) + len(8) + crc(4)
        f.write(struct.pack("<Q", 0xFFFFFFFFFFFFFFF0))
    _assert_records_equal(read_shard(path), recs[:1])


def test_append_behind_foreign_file_refused(tmp_path):
    """Appending records behind a non-shard file would 'succeed' while
    producing a file the scanner can never read — both the writer and
    merge_shards must refuse up front."""
    path = str(tmp_path / "foreign.bin")
    with open(path, "wb") as f:
        f.write(b"NOTASHRD-some-other-format")
    with pytest.raises(ValueError, match="refusing to append"):
        ShardWriter(path)
    src = str(tmp_path / "src.qtshard")
    with ShardWriter(src) as w:
        for r in _sample_records(2):
            w.append(r)
    with pytest.raises(ValueError, match="refusing to append"):
        merge_shards(path, [src])
    with open(path, "rb") as f:
        assert f.read() == b"NOTASHRD-some-other-format"  # untouched


def test_missing_file_raises_filenotfound(tmp_path):
    """Error types must not depend on which backend is active: a missing file
    is FileNotFoundError on both (ADVICE r1); ValueError stays reserved for
    bad magic/corruption."""
    with pytest.raises(FileNotFoundError):
        index_shard(str(tmp_path / "nope.qtshard"))


def test_merge_onto_self_raises(tmp_path):
    p = str(tmp_path / "self.qtshard")
    with ShardWriter(p) as w:
        for r in _sample_records(2):
            w.append(r)
    with pytest.raises(ValueError):
        merge_shards(p, [p])
    assert len(read_shard(p)) == 2  # untouched, not self-concatenated


def test_merge_shards(tmp_path):
    srcs = []
    all_recs = []
    for i in range(3):
        p = str(tmp_path / f"part{i}.qtshard")
        recs = _sample_records(2, seed=i)
        with ShardWriter(p) as w:
            for r in recs:
                w.append(r)
        srcs.append(p)
        all_recs.extend(recs)
    srcs.insert(1, str(tmp_path / "missing.qtshard"))  # tolerated like the reference merge
    dst = str(tmp_path / "combined.qtshard")
    n = merge_shards(dst, srcs)
    assert n == 6
    _assert_records_equal(read_shard(dst), all_recs)


def test_python_fallback_interoperates(tmp_path):
    """A shard written by the pure-Python framing reads back identically here."""
    path = str(tmp_path / "py.qtshard")
    recs = _sample_records(3, seed=7)
    code = (
        "import os, sys, numpy as np\n"
        "os.environ['QUATTRO_TPU_PURE_PYTHON_IO'] = '1'\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from quattro_tpu.io.shardio import ShardWriter, native_available\n"
        "assert not native_available()\n"
        "rng = np.random.default_rng(7)\n"
        f"with ShardWriter({path!r}) as w:\n"
        "    for i in range(3):\n"
        "        w.append({'x_seq': rng.normal(size=(31, 4)),\n"
        "                  'kk': rng.normal(size=(30, 5)).astype(np.float32),\n"
        "                  'iteration': np.int64(i),\n"
        "                  'cost': np.float64(rng.normal())})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True)
    _assert_records_equal(read_shard(path), recs)


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_backend_is_active():
    """In this environment the C++ backend must actually be the one in use."""
    assert shardio._load_native() is not None


def test_gain_dataset_roundtrip_shard_and_npz(tmp_path):
    from quattro_tpu.training import GainDataset, load_gain_dataset, save_gain_dataset

    rng = np.random.default_rng(3)
    ds = GainDataset(
        x_data=rng.normal(size=(10, 31, 4)).astype(np.float32),
        kk_data=rng.normal(size=(10, 30, 5)).astype(np.float32),
    )
    shard = str(tmp_path / "ds.qtshard")
    npz = str(tmp_path / "ds.npz")
    save_gain_dataset(shard, ds, rows_per_record=4)  # 3 records: 4+4+2 rows
    save_gain_dataset(npz, ds)
    back = load_gain_dataset([shard, npz])  # mixed formats concatenate
    np.testing.assert_array_equal(back.x_data[:10], ds.x_data)
    np.testing.assert_array_equal(back.x_data[10:], ds.x_data)
    np.testing.assert_array_equal(back.kk_data[:10], ds.kk_data)
    assert back.kk_data.shape[0] == 20
