"""Data layer tests: WAV IO, transforms, datasets, tar shards, loader."""

import json
import os
import tarfile

import numpy as np
import pytest

from stable_audio_tools_tpu.data.dataset import (
    DataLoader,
    LocalTarDataset,
    PreEncodedDataset,
    SampleDataset,
    collation_fn,
    create_dataloader_from_config,
    fast_scandir,
)
from stable_audio_tools_tpu.data.utils import (
    Mono,
    PadCrop_Normalized_T,
    Stereo,
    VolumeNorm,
    measure_loudness_lufs,
)
from stable_audio_tools_tpu.data.wav import load_wav, save_wav


def _make_wavs(tmp_path, n=4, sr=16000, seconds=2.0, channels=2):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        audio = (rng.randn(channels, int(sr * seconds)) * 0.1).astype(np.float32)
        path = str(tmp_path / f"sound_{i}.wav")
        save_wav(path, audio, sr)
        paths.append(path)
    return paths


def test_wav_roundtrip_16bit(tmp_path):
    audio = np.clip(
        np.random.RandomState(1).randn(2, 1000) * 0.3, -0.99, 0.99
    ).astype(np.float32)
    path = str(tmp_path / "x.wav")
    save_wav(path, audio, 22050)
    loaded, sr = load_wav(path)
    assert sr == 22050
    assert loaded.shape == (2, 1000)
    np.testing.assert_allclose(loaded, audio, atol=1e-4)


def test_wav_roundtrip_float32(tmp_path):
    audio = (np.random.RandomState(2).randn(1, 500) * 0.3).astype(np.float32)
    path = str(tmp_path / "f.wav")
    save_wav(path, audio, 44100, float32=True)
    loaded, sr = load_wav(path)
    np.testing.assert_allclose(loaded, audio, atol=1e-7)


def test_pad_crop_normalized():
    pc = PadCrop_Normalized_T(1000, 16000, randomize=True)
    audio = np.random.RandomState(3).randn(2, 2500).astype(np.float32)
    chunk, t0, t1, s0, s1, mask = pc(audio)
    assert chunk.shape == (2, 1000)
    assert mask.sum() == 1000
    # shorter than target → pad + mask
    chunk, *_, mask = pc(np.ones((2, 300), np.float32))
    assert chunk.shape == (2, 1000)
    assert mask.sum() == 300


def test_stereo_mono():
    mono = np.ones((1, 100))
    assert Stereo()(mono).shape == (2, 100)
    assert Mono()(np.ones((2, 100))).shape == (1, 100)


def test_volume_norm_lufs():
    sr = 16000
    t = np.arange(sr) / sr
    sine = 0.1 * np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)
    vn = VolumeNorm(params=(-16, 0), sample_rate=sr)
    out = vn(sine)
    measured = measure_loudness_lufs(out, sr)
    assert abs(measured - (-16)) < 1.5, measured


def test_sample_dataset_and_loader(tmp_path):
    _make_wavs(tmp_path)
    ds = SampleDataset(
        [{"path": str(tmp_path)}], sample_size=8000, sample_rate=16000,
        force_channels="stereo",
    )
    assert len(ds) == 4
    audio, info = ds[0]
    assert audio.shape == (2, 8000)
    assert "seconds_total" in info and info["seconds_total"] == 2
    assert info["padding_mask"].shape == (8000,)

    dl = DataLoader(ds, batch_size=2, num_workers=2)
    batch_audio, metadata = next(iter(dl))
    assert batch_audio.shape == (2, 2, 8000)
    assert len(metadata) == 2


def test_custom_metadata_hook(tmp_path):
    _make_wavs(tmp_path, n=2)
    hook = tmp_path / "hook.py"
    hook.write_text(
        "def get_custom_metadata(info, audio):\n"
        "    return {'prompt': 'a test sound'}\n"
    )
    ds = SampleDataset(
        [{"path": str(tmp_path), "custom_metadata_module": str(hook)}],
        sample_size=4000, sample_rate=16000,
    )
    _, info = ds[0]
    assert info["prompt"] == "a test sound"


def test_pre_encoded_dataset(tmp_path):
    for i in range(3):
        latents = np.random.RandomState(i).randn(8, 128).astype(np.float32)
        np.save(tmp_path / f"lat_{i}.npy", latents)
        with open(tmp_path / f"lat_{i}.json", "w") as f:
            json.dump({"prompt": f"sample {i}",
                       "padding_mask": [1.0] * 100 + [0.0] * 28}, f)
    ds = PreEncodedDataset([{"path": str(tmp_path)}], sample_size=64)
    latents, info = ds[0]
    assert latents.shape == (8, 64)
    assert info["padding_mask"].shape == (64,)
    assert "prompt" in info


def test_tar_dataset(tmp_path):
    sr = 16000
    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            wav_path = tmp_path / f"s{i}.wav"
            save_wav(str(wav_path), np.random.RandomState(i).randn(2, sr).astype(
                np.float32) * 0.1, sr)
            tf.add(wav_path, arcname=f"{i:04d}.wav")
            meta = tmp_path / f"s{i}.json"
            meta.write_text(json.dumps({"text": f"sound {i}"}))
            tf.add(meta, arcname=f"{i:04d}.json")
    ds = LocalTarDataset([str(shard)], sample_size=8000, sample_rate=sr,
                         shuffle=False)
    samples = list(ds)
    assert len(samples) == 3
    audio, info = samples[0]
    assert audio.shape == (2, 8000)
    assert info["prompt"] == "sound 0"


def test_create_dataloader_from_config(tmp_path):
    _make_wavs(tmp_path)
    dl = create_dataloader_from_config(
        {"dataset_type": "audio_dir", "datasets": [{"path": str(tmp_path)}]},
        batch_size=2, sample_size=4000, sample_rate=16000, audio_channels=2,
        num_workers=1,
    )
    audio, metadata = next(iter(dl))
    assert audio.shape == (2, 2, 4000)


def test_is_silence_and_dbmax():
    from stable_audio_tools_tpu.data.dataset import get_dbmax, is_silence

    loud = np.ones((1, 100), np.float32) * 0.5
    quiet = np.ones((1, 100), np.float32) * 1e-4
    assert not is_silence(loud)
    assert is_silence(quiet)  # -80 dBFS < -60
    assert abs(get_dbmax(loud) - 20 * np.log10(0.5)) < 1e-4


def test_remove_long_silence_collapses_runs():
    from stable_audio_tools_tpu.data.dataset import remove_long_silence

    sr = 1000
    loud = np.ones(500, np.float32) * 0.5
    long_sil = np.zeros(2000, np.float32)  # 2 s >> 0.25 s max
    short_sil = np.zeros(100, np.float32)  # 0.1 s, kept as-is
    audio = np.concatenate([loud, long_sil, loud, short_sil, loud])[None]
    out = remove_long_silence(audio, sr, (0.01, 0.5), 0.25)
    assert out.shape[0] == 1
    # long run collapsed to 0.5 s (500 samples), short run kept
    assert out.shape[1] == 500 + 500 + 500 + 100 + 500
    np.testing.assert_array_equal(out[0, :500], loud)


def test_sample_dataset_rejects_silent_clips(tmp_path):
    from stable_audio_tools_tpu.data.dataset import SampleDataset

    sr = 16000
    d = tmp_path / "wavs"
    d.mkdir()
    save_wav(str(d / "silent.wav"),
             np.zeros((1, sr), np.float32) + 1e-5, sr)
    save_wav(str(d / "loud.wav"),
             (np.random.RandomState(0).randn(1, sr) * 0.3).astype(np.float32),
             sr)
    ds = SampleDataset([{"path": str(d)}], sample_size=8000, sample_rate=sr,
                       force_channels="mono", augment_phase=False)
    # the silent file must always re-roll onto the loud one
    for idx in range(len(ds)):
        audio, info = ds[idx]
        assert "loud" in info["path"]


def test_tar_dataset_silence_filter_and_removal(tmp_path):
    import tarfile

    from stable_audio_tools_tpu.data.dataset import LocalTarDataset

    sr = 16000
    tar_path = tmp_path / "shard.tar"
    wav_dir = tmp_path / "w"
    wav_dir.mkdir()
    # one silent, one loud-with-long-silence (mono)
    save_wav(str(wav_dir / "a.wav"), np.zeros((1, sr), np.float32), sr)
    loud = np.concatenate([
        np.ones(4000, np.float32) * 0.4, np.zeros(sr, np.float32),
        np.ones(4000, np.float32) * 0.4])[None]
    save_wav(str(wav_dir / "b.wav"), loud, sr)
    with tarfile.open(tar_path, "w") as tf:
        for stem in ("a", "b"):
            tf.add(str(wav_dir / f"{stem}.wav"), arcname=f"{stem}.wav")
            jp = wav_dir / f"{stem}.json"
            jp.write_text('{"text": "x"}')
            tf.add(str(jp), arcname=f"{stem}.json")

    ds = LocalTarDataset([str(tar_path)], sample_size=8000, sample_rate=sr,
                         force_channels="mono", augment_phase=False,
                         shuffle=False, remove_silence=True,
                         silence_threshold=(0.01, 0.1),
                         max_silence_duration=0.25)
    samples = list(ds)
    assert len(samples) == 1  # silent sample filtered out
    audio, info = samples[0]
    assert audio.shape == (1, 8000)


def test_multihost_rank_sharding_disjoint_and_complete(tmp_path):
    """Rank-dependent shard assignment end-to-end: map-style DataLoader
    strides a shared seeded permutation (DistributedSampler semantics) and
    LocalTarDataset splits tar shards — across ranks the union covers the
    dataset exactly once per epoch."""
    from stable_audio_tools_tpu.data.dataset import (
        DataLoader, LocalTarDataset, SampleDataset,
    )
    from stable_audio_tools_tpu.data.wav import save_wav

    root = tmp_path / "audio"
    root.mkdir()
    sr = 16000
    for i in range(8):
        x = (np.random.RandomState(i).randn(2, 2048) * 0.1).astype(np.float32)
        save_wav(str(root / f"clip{i}.wav"), x.T, sr)

    ds = SampleDataset([{"path": str(root)}], sample_size=1024, sample_rate=sr,
                       augment_phase=False)
    seen = {}
    for rank in range(2):
        dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                        process_index=rank, process_count=2, seed=7)
        paths = []
        for batch in dl:
            audio, infos = batch
            paths.extend(i["path"] for i in infos)
        seen[rank] = paths
        assert len(paths) == 4  # half the dataset per rank
    assert not (set(seen[0]) & set(seen[1]))  # disjoint
    assert set(seen[0]) | set(seen[1]) == set(ds.filenames)  # complete

    # tar shards split per process
    import tarfile

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for si in range(4):
        with tarfile.open(shard_dir / f"s{si}.tar", "w") as tf:
            import io as _io
            import json as _json

            wav_path = str(root / f"clip{si}.wav")
            tf.add(wav_path, arcname=f"a{si}.wav")
            meta = _json.dumps({"idx": si}).encode()
            ti = tarfile.TarInfo(f"a{si}.json")
            ti.size = len(meta)
            tf.addfile(ti, _io.BytesIO(meta))
    shards = sorted(str(p) for p in shard_dir.glob("*.tar"))
    d0 = LocalTarDataset(shards, sample_size=1024, sample_rate=sr,
                         process_index=0, process_count=2)
    d1 = LocalTarDataset(shards, sample_size=1024, sample_rate=sr,
                         process_index=1, process_count=2)
    assert not (set(d0.shards) & set(d1.shards))
    assert set(d0.shards) | set(d1.shards) == set(shards)
    # each rank's stream actually yields samples from its own shards only
    first = next(iter(d0))
    assert first is not None


def test_multihost_rank_sharding_equal_batch_counts(tmp_path):
    """Uneven dataset sizes must still give every rank the SAME number of
    batches (DistributedSampler pads by repeating from the head) — unequal
    counts would hang the last collective of each epoch."""
    from stable_audio_tools_tpu.data.dataset import DataLoader, SampleDataset
    from stable_audio_tools_tpu.data.wav import save_wav

    root = tmp_path / "audio"
    root.mkdir()
    sr = 16000
    for i in range(7):  # 7 % 2 != 0
        x = (np.random.RandomState(i).randn(2, 2048) * 0.1).astype(np.float32)
        save_wav(str(root / f"clip{i}.wav"), x.T, sr)
    ds = SampleDataset([{"path": str(root)}], sample_size=1024, sample_rate=sr,
                       augment_phase=False)
    counts = []
    for rank in range(2):
        dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                        process_index=rank, process_count=2, seed=3)
        counts.append(sum(1 for _ in dl))
    assert counts[0] == counts[1] == 2  # 8 padded indices -> 4 each -> 2 batches


def test_dataloader_pad_equalizes_tiny_dataset():
    """Datasets smaller than process_count must still give EVERY rank the
    same number of batches (multi-host collective alignment)."""
    from stable_audio_tools_tpu.data.dataset import DataLoader

    class TwoItems:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.full((1, 4), float(i), np.float32), {"i": i}

    counts = []
    for rank in range(8):
        dl = DataLoader(TwoItems(), batch_size=1, shuffle=False,
                        num_workers=1, process_index=rank, process_count=8)
        counts.append(sum(1 for _ in dl))
    assert counts == [1] * 8, counts


def test_tar_dataset_resample_loops_forever(tmp_path):
    import tarfile
    from stable_audio_tools_tpu.data.dataset import LocalTarDataset
    from stable_audio_tools_tpu.data.wav import save_wav

    sr = 16000
    shard = tmp_path / "loop.tar"
    with tarfile.open(shard, "w") as tf:
        wav_path = tmp_path / "a.wav"
        save_wav(str(wav_path),
                 np.random.RandomState(0).randn(2, sr).astype(np.float32) * 0.1,
                 sr)
        tf.add(wav_path, arcname="0000.wav")
    ds = LocalTarDataset([str(shard)], sample_size=8000, sample_rate=sr,
                         shuffle=False, resample=True)
    it = iter(ds)
    # one underlying sample, but the resampled stream keeps producing
    got = [next(it) for _ in range(5)]
    assert len(got) == 5
