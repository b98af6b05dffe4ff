"""Data-layer tests: sampling, processors, MetaLoader/sampler semantics,
native prefetcher."""

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
