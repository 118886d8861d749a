"""FsShim: the filesystem shim under every checkpoint/recovery path.

Both branches (os-level and Hadoop-via-file://) are exercised for the
operations the crash-safety arguments rely on: atomic write, the
.tmp read fallback, rename, and the scheme gate.
"""

import json
import os

import pytest

from cs6913_web_search_engines_spark.sources.fsutil import FsShim


@pytest.fixture(params=["local", "uri"])
def shim_base(request, spark, tmp_path):
    base = str(tmp_path / "fsx")
    os.makedirs(base)
    if request.param == "uri":
        return FsShim(spark, "file://" + base), "file://" + base, base
    return FsShim(spark, base), base, base


def test_write_read_roundtrip(shim_base):
    fs, base, local = shim_base
    p = fs.join(base, "meta.json")
    fs.write_text(p, '{"a": 1}')
    assert fs.exists(p)
    assert json.loads(fs.read_text(p)) == {"a": 1}
    # overwrite stays atomic (tmp sibling must not linger)
    fs.write_text(p, '{"a": 2}')
    assert json.loads(fs.read_text(p)) == {"a": 2}
    assert not os.path.exists(os.path.join(local, "meta.json.tmp"))


def test_read_json_or_none_tmp_fallback(shim_base):
    """The remote write has a delete→rename window where only the
    fully-written .tmp exists; the fallback must bridge it."""
    fs, base, local = shim_base
    p = fs.join(base, "snap.json")
    with open(os.path.join(local, "snap.json.tmp"), "w") as f:
        f.write('{"runs": [1, 2]}')
    assert fs.read_json_or_none(p) == {"runs": [1, 2]}
    # a truncated tmp (crash mid-write) is treated as absent
    with open(os.path.join(local, "snap.json.tmp"), "w") as f:
        f.write('{"runs": [1,')
    assert fs.read_json_or_none(p) is None
    # main file wins over tmp when both exist
    fs.write_text(p, '{"runs": [3]}')
    assert fs.read_json_or_none(p) == {"runs": [3]}


def test_rename_and_dirs(shim_base):
    fs, base, local = shim_base
    d = fs.join(base, "sub")
    fs.mkdirs(d)
    assert fs.is_dir(d)
    fs.write_text(fs.join(d, "x.txt"), "x")
    fs.rename(fs.join(d, "x.txt"), fs.join(d, "y.txt"))
    assert not fs.exists(fs.join(d, "x.txt"))
    assert fs.read_text(fs.join(d, "y.txt")) == "x"
    assert any(n == "y.txt" for n in fs.list_names(d))
    fs.delete_file(fs.join(d, "y.txt"))
    assert not fs.exists(fs.join(d, "y.txt"))
    fs.delete_tree(d)
    assert not fs.is_dir(d)


def test_wipe_children_keeps_base(shim_base):
    fs, base, local = shim_base
    fs.mkdirs(fs.join(base, "a"))
    fs.write_text(fs.join(base, "b.txt"), "b")
    fs.wipe_children(base)
    assert fs.is_dir(base) if fs.remote else os.path.isdir(local)
    assert fs.list_names(base) == []


def test_scheme_atomic_gate():
    assert FsShim.scheme_atomic("/local/path")
    assert FsShim.scheme_atomic("file:///x")
    assert FsShim.scheme_atomic("hdfs://nn/x")
    assert not FsShim.scheme_atomic("s3a://bucket/x")
    assert not FsShim.scheme_atomic("gs://bucket/x")


def test_bucket_bytes_is_remote_only(spark, tmp_path):
    with pytest.raises(ValueError):
        FsShim(spark, str(tmp_path)).bucket_bytes(str(tmp_path))
