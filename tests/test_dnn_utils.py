"""dnnlib-equivalent utilities tests."""
import numpy as np
import jax
import pytest

from nerf_siren_tpu.utils.dnn import (
    EasyDict,
    construct_class_by_name,
    infinite_batches,
    param_count,
    param_summary,
)


def test_easydict():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_construct_class_by_name():
    arr = construct_class_by_name("numpy.ndarray", (2, 3))
    assert arr.shape == (2, 3)
    od = construct_class_by_name("collections.OrderedDict", [("x", 1)])
    assert od["x"] == 1


def test_param_summary():
    from nerf_siren_tpu.models.nerf import init_nerf
    params = {"coarse": init_nerf(jax.random.PRNGKey(0)),
              "fine": init_nerf(jax.random.PRNGKey(1))}
    n = param_count(params["coarse"])
    assert n > 500_000  # 8x256 trunk
    s = param_summary(params)
    assert "coarse" in s and "total" in s
    assert f"{2 * n:,}" in s  # total = 2x one model


def test_infinite_batches_sharding():
    arrays = {"x": np.arange(100), "y": np.arange(100) * 2}
    seen = set()
    it0 = infinite_batches(arrays, 10, seed=0, shard_index=0, num_shards=2)
    it1 = infinite_batches(arrays, 10, seed=0, shard_index=1, num_shards=2)
    for _ in range(5):
        b0, b1 = next(it0), next(it1)
        assert np.array_equal(b0["y"], b0["x"] * 2)
        seen.update(b0["x"].tolist())
        seen.update(b1["x"].tolist())
        # shards are disjoint: shard 0 gets evens, shard 1 odds
        assert all(v % 2 == 0 for v in b0["x"])
        assert all(v % 2 == 1 for v in b1["x"])
    assert len(seen) == 100  # full coverage after an epoch
    # stream continues past epoch boundaries
    for _ in range(20):
        next(it0)


def test_label_merge_11():
    from nerf_siren_tpu.utils.data import merge_cls_11, remap_labels
    m = merge_cls_11()
    assert m[1] == 1          # skin
    assert m[2] == m[3] == 2  # brows
    assert m[16] == 11        # cloth -> ignore
    assert m[17] == 10        # hair
    raw = np.array([[1, 2, 16, 17, 0]])
    out = remap_labels(raw, m)
    np.testing.assert_array_equal(out, [[1, 2, 11, 10, 0]])


def test_analyze_parse_labels(tmp_path):
    from PIL import Image
    from nerf_siren_tpu.utils.data import analyze_parse_labels
    d = tmp_path / "raw_parse"
    d.mkdir()
    Image.fromarray(np.array([[0, 10], [10, 20]], dtype=np.uint8)).save(d / "a.png")
    res = analyze_parse_labels(str(tmp_path))
    counts = list(res.values())[0]
    assert counts == {0: 1, 10: 2, 20: 1}


def test_logger_tees_to_file(tmp_path):
    import sys
    from nerf_siren_tpu.utils.dnn import Logger

    log = tmp_path / "run.log"
    with Logger(str(log)):
        print("hello tee")
    assert sys.stdout is not None
    assert "hello tee" in log.read_text()
    print("after close")  # streams restored, no crash


def test_open_url_plain_path_and_cache(tmp_path):
    from nerf_siren_tpu.utils.dnn import open_url

    p = tmp_path / "weights.bin"
    p.write_bytes(b"abc")
    with open_url(str(p)) as f:
        assert f.read() == b"abc"
    assert open_url("file://" + str(p), return_filename=True) == str(p)

    # http miss in a zero-egress sandbox raises a clear error
    import pytest
    with pytest.raises(IOError):
        open_url("http://localhost:1/none.bin", cache_dir=str(tmp_path / "c"))

    # pre-seeded cache entry is served without network
    import hashlib, os
    cd = tmp_path / "cache"
    cd.mkdir()
    url = "https://example.com/model.pkl"
    md5 = hashlib.md5(url.encode()).hexdigest()
    (cd / f"{md5}_model.pkl").write_bytes(b"cached")
    with open_url(url, cache_dir=str(cd)) as f:
        assert f.read() == b"cached"
