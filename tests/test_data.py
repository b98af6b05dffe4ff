"""Data-layer tests: sampling, processors, MetaLoader/sampler semantics,
native prefetcher."""

import os

import numpy as np
import pytest

from infinite_video_tpu.data import loader, native_prefetch, processors, video_reader


def test_sample_indices_uniform_matches_reference_formula():
    # video_processor.py:34 — arange(0, vlen, vlen/n)
    idx = video_reader.sample_indices(100, 8, "uniform")
    assert idx == np.arange(0, 100, 100 / 8).astype(int).tolist()


def test_sample_indices_middle_matches_vc2_get_index():
    # run_nextqa_mistral.py:485-491
    vlen, n = 300, 16
    seg = float(vlen - 1) / n
    start = int(seg / 2)
    expected = [start + int(np.round(seg * i)) for i in range(n)]
    assert video_reader.sample_indices(vlen, n, "middle") == expected


def test_chunk_frames_shape():
    frames = np.zeros((32, 8, 8, 3), np.uint8)
    chunks = video_reader.chunk_frames(frames, 8)
    assert chunks.shape == (4, 1, 8, 8, 8, 3)


def test_processor_normalization():
    proc = processors.eval_processor(image_size=16)
    frames = np.full((2, 20, 24, 3), 255, np.uint8)
    out = proc(frames)
    assert out.shape == (2, 16, 16, 3)
    expected = (1.0 - np.asarray(processors.CLIP_MEAN)) / np.asarray(processors.CLIP_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_normalization_dispatch():
    assert processors.normalization_for_encoder("beit-large") == ((0.5,) * 3, (0.5,) * 3)
    assert processors.normalization_for_encoder("clip-vit")[0] == processors.CLIP_MEAN
    assert processors.normalization_for_encoder("vit-l")[0] == processors.IMAGENET_MEAN


class _ListLoader:
    def __init__(self, items, sampler=None):
        self.items = items
        self.sampler = sampler

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


def test_metaloader_interleave_deterministic_and_complete():
    a = _ListLoader(["a0", "a1", "a2"])
    b = _ListLoader(["b0", "b1"])
    m1 = loader.MetaLoader({"a": a, "b": b}, seed=7)
    m2 = loader.MetaLoader({"a": _ListLoader(["a0", "a1", "a2"]),
                            "b": _ListLoader(["b0", "b1"])}, seed=7)
    o1 = list(m1)
    o2 = list(m2)
    assert o1 == o2  # same seed ⇒ same cross-host order
    assert len(o1) == 5
    assert [x for n, x in o1 if n == "a"] == ["a0", "a1", "a2"]


def test_metaloader_resume_skips_and_fast_forwards():
    class FakeSampler:
        start_iter = 0

        def set_start_iter(self, n):
            self.start_iter = n

    sa, sb = FakeSampler(), FakeSampler()
    full_order = loader.MetaLoader(
        {"a": _ListLoader(list("0123")), "b": _ListLoader(list("45"))},
        seed=3).iter_order
    m = loader.MetaLoader(
        {"a": _ListLoader(list("0123"), sa), "b": _ListLoader(list("45"), sb)},
        seed=3, skip_num=3)
    assert m.iter_order == full_order[3:]
    skipped = full_order[:3]
    assert sa.start_iter == skipped.count("a")
    assert sb.start_iter == skipped.count("b")


def test_stateful_sampler_resume():
    s = loader.StatefulShardSampler(100, batch_size=5, rank=1, num_replicas=2,
                                    seed=0)
    full = list(iter(s))
    assert len(full) == 50
    assert all(50 <= i < 100 for i in full)  # rank-1 contiguous shard
    s.set_start_iter(3)
    resumed = list(iter(s))
    assert resumed == full[15:]


def test_retrying_fetch():
    calls = []

    def fetch(i):
        calls.append(i)
        if len(calls) < 3:
            raise IOError("corrupt")
        return f"ok{i}"

    safe = loader.retrying(fetch, num_tries=3, dataset_len=10)
    assert safe(0).startswith("ok")
    with pytest.raises(RuntimeError):
        loader.retrying(lambda i: 1 / 0, num_tries=2, dataset_len=10)(0)


@pytest.mark.parametrize("prefer_native", [True, False])
def test_prefetcher_roundtrip(tmp_path, prefer_native):
    paths = []
    for i in range(6):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        paths.append(str(p))
    with native_prefetch.Prefetcher(paths, window=2, workers=2,
                                    prefer_native=prefer_native) as pf:
        if prefer_native and pf.backend != "native":
            pytest.skip("no compiler available")
        for i in range(6):
            data = pf.get(i)
            assert data == bytes([i]) * (100 + i)
            pf.release(i)


def test_prefetcher_missing_file_raises(tmp_path):
    good = tmp_path / "g.bin"
    good.write_bytes(b"x" * 10)
    with native_prefetch.Prefetcher([str(good), str(tmp_path / "missing.bin")],
                                    window=2, workers=1) as pf:
        assert pf.get(0) == b"x" * 10
        with pytest.raises((IOError, OSError)):
            pf.get(1)


def _load_reference_randaug():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_randaug",
        "/root/reference/infty-Video-LLaMA/InfVideoLLaMA/processors/randaugment.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo unavailable")
def test_randaugment_ops_match_reference():
    """Deterministic (sign-free) ops must match the reference pixel-exactly;
    signed geometric ops match when the drawn sign agrees."""
    from infinite_video_tpu.data import randaugment as ra

    ref = _load_reference_randaug()
    img = np.random.default_rng(0).integers(0, 256, (32, 40, 3), np.uint8)
    level = 7

    cases = {
        "AutoContrast": (ref.autocontrast_func(img), ra.AUG_OPS["AutoContrast"]),
        "Equalize": (ref.equalize_func(img), ra.AUG_OPS["Equalize"]),
        "Solarize": (ref.solarize_func(img, int(level / 10 * 256)),
                     ra.AUG_OPS["Solarize"]),
        # ref posterize_func overflows under numpy>=2 (np.uint8(255<<6));
        # compare against its intended bitmask directly
        "Posterize": (img & np.uint8((255 << (8 - int(level / 10 * 4))) & 255),
                      ra.AUG_OPS["Posterize"]),
        "Brightness": (ref.brightness_func(img, level / 10 * 1.8 + 0.1),
                       ra.AUG_OPS["Brightness"]),
        "Contrast": (ref.contrast_func(img, level / 10 * 1.8 + 0.1),
                     ra.AUG_OPS["Contrast"]),
    }
    # ref sharpness_func casts without clipping and wraps around on uint8
    # overflow (randaugment.py:146); compare against its clipped formula
    import cv2

    f = level / 10 * 1.8 + 0.1
    kern = np.full((3, 3), 1.0, np.float32)
    kern[1, 1] = 5.0
    kern /= 13.0
    deg = cv2.filter2D(img, -1, kern).astype(np.float32)
    want_sharp = img.astype(np.float32).copy()
    want_sharp[1:-1, 1:-1] = deg[1:-1, 1:-1] + f * (want_sharp[1:-1, 1:-1]
                                                    - deg[1:-1, 1:-1])
    cases["Sharpness"] = (np.clip(want_sharp, 0, 255).astype(np.uint8),
                          ra.AUG_OPS["Sharpness"])
    rng = np.random.default_rng(1)
    for name, (want, fn) in cases.items():
        got = fn(img, level, rng)
        # uint8 LUT rounding may differ by 1 at the clip boundary
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"{name}: max diff {diff.max()}"

    # Color: reference matmul computes BGR-weighted luma (cv2 channel order);
    # ours is a luma blend — both are PIL-equivalent up to channel convention,
    # so compare against the reference formula with matching weights.
    gray = img.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)
    want_color = np.clip(gray[..., None] + f * (img - gray[..., None]), 0, 255)
    got_color = ra.AUG_OPS["Color"](img, level, rng)
    assert np.abs(got_color.astype(int) - want_color.astype(int)).max() <= 1

    # signed geometric op: force the positive branch in both
    class _PosRng:
        def random(self):
            return 0.6  # ref: np.random.random() > 0.5 -> keep positive sign

    fill = (128, 128, 128)  # arg_dict passes replace_value, not the default
    want_rot = ref.rotate_func(img, -(level / 10 * 30), fill=fill)
    got_rot = ra.AUG_OPS["Rotate"](img, level, np.random.default_rng(2))
    # compare against whichever sign our rng drew
    alt_rot = ref.rotate_func(img, level / 10 * 30, fill=fill)
    assert (np.array_equal(got_rot, want_rot)
            or np.array_equal(got_rot, alt_rot))


def test_randaugment_clip_consistency_and_processor_hook():
    from infinite_video_tpu.data.processors import train_processor
    from infinite_video_tpu.data.randaugment import RandAugment

    frames = np.random.default_rng(3).integers(0, 256, (3, 48, 48, 3), np.uint8)
    aug = RandAugment(n=2, m=5, augs=["Brightness", "Solarize"])
    out = aug(frames, np.random.default_rng(4))
    assert out.shape == frames.shape and out.dtype == np.uint8
    # temporally consistent: identical input frames stay identical after aug
    same = np.repeat(frames[:1], 3, axis=0)
    out_same = aug(same, np.random.default_rng(5))
    assert np.array_equal(out_same[0], out_same[1])
    assert np.array_equal(out_same[1], out_same[2])

    proc = train_processor(image_size=32, rand_aug=True)
    res = proc(frames, np.random.default_rng(6))
    assert res.shape == (3, 32, 32, 3) and res.dtype == np.float32


def _write_shard(path, items, corrupt_keys=()):
    """items: [(key, color, caption)] -> tar with key.jpg + key.json."""
    import json as _json
    import tarfile

    import cv2

    with tarfile.open(path, "w") as tf:
        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            import io as _io
            tf.addfile(info, _io.BytesIO(data))

        for key, color, caption in items:
            img = np.full((32, 48, 3), color, np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            data = b"not-a-jpeg" if key in corrupt_keys else buf.tobytes()
            add(f"{key}.jpg", data)
            add(f"{key}.json",
                _json.dumps({"caption": caption}).encode())


def test_webdataset_shards_pairs_and_skips_corrupt(tmp_path):
    pytest.importorskip("cv2")
    from infinite_video_tpu.data.webdataset import WebDatasetShards

    _write_shard(str(tmp_path / "s-00000.tar"),
                 [("a", 10, "cap a"), ("b", 50, "cap b")],
                 corrupt_keys=("b",))
    _write_shard(str(tmp_path / "s-00001.tar"), [("c", 90, "cap c")])

    ds = WebDatasetShards(str(tmp_path / "s-*.tar"), shuffle_buffer=1,
                          seed=0)
    got = list(ds)
    caps = sorted(c for _, c in got)
    assert caps == ["cap a", "cap c"]          # corrupt 'b' skipped
    frames, _ = got[0]
    assert frames.shape[0] == 1 and frames.shape[-1] == 3
    assert frames.dtype == np.float32


def test_webdataset_brace_expansion_and_epoch_size(tmp_path):
    pytest.importorskip("cv2")
    from infinite_video_tpu.data.webdataset import (WebDatasetShards,
                                                    expand_shard_pattern)

    assert expand_shard_pattern("x-{00000..00002}.tar") == [
        "x-00000.tar", "x-00001.tar", "x-00002.tar"]

    for i in range(2):
        _write_shard(str(tmp_path / f"t-{i:05d}.tar"),
                     [(f"k{i}{j}", 20 * j + 5, f"cap {i}{j}")
                      for j in range(3)])
    ds = WebDatasetShards(str(tmp_path / "t-{00000..00001}.tar"),
                          shuffle_buffer=4, seed=1, resample=True,
                          epoch_size=5)
    got = list(ds)
    assert len(got) == 5                        # resample bounded by epoch
    assert all(c.startswith("cap ") for _, c in got)
