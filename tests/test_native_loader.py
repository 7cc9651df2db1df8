"""Native C++ melbin loader: pack + batch parity vs the Python path."""

from pathlib import Path

import numpy as np
import pytest

from tortoise_tts_tpu.data.native_loader import (MelBinDataset, get_lib,
                                                 pack_melbin)

from tests.test_data_trainer import _write_artifact

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no native toolchain")


@pytest.fixture()
def packed(tmp_path):
    paths = []
    for i in range(6):
        p = tmp_path / f"utt{i}.mel"
        _write_artifact(p, n_codes=20 + i, n_text=8 + i, seed=i, dim=64)
        paths.append(p)
    out = tmp_path / "data.melbin"
    n = pack_melbin(paths, out)
    assert n == 6
    return paths, out


def test_batch_matches_python_path(packed):
    from tortoise_tts_tpu.data.dataset import load_artifact
    paths, out = packed
    ds = MelBinDataset(out, lat_dim=64, dlat_dim=128)
    assert len(ds) == 6
    batch = ds.batch([0, 3, 5], text_bucket=16, mel_bucket=32)
    assert batch["text"].shape == (3, 16)
    assert batch["codes"].shape == (3, 32)
    for row, i in enumerate([0, 3, 5]):
        art = load_artifact(paths[i])
        codes = np.asarray(art["codes"]).reshape(-1)
        text = np.asarray(art["text"]).reshape(-1)
        n_t, n_c = min(len(text), 16), min(len(codes), 32)
        np.testing.assert_array_equal(batch["text"][row, :n_t], text[:n_t])
        assert (batch["text"][row, n_t:] == 0).all()
        np.testing.assert_array_equal(batch["codes"][row, :n_c],
                                      codes[:n_c])
        assert batch["text_lengths"][row] == n_t
        assert batch["wav_lengths"][row] == min(
            art["metadata"]["original_length"], n_c * 1024)
        np.testing.assert_allclose(
            batch["latents"][row], np.asarray(art["latent"][0]).reshape(-1))


def test_durations_and_bad_index(packed):
    _, out = packed
    ds = MelBinDataset(out, lat_dim=64, dlat_dim=128)
    d = ds.durations()
    assert d.shape == (6,) and (d > 0).all()
    with pytest.raises(ValueError):
        ds.batch([99], text_bucket=8, mel_bucket=8)


def test_corrupt_pack_rejected(packed, tmp_path):
    """mb_open must fail cleanly (Python IOError) on truncated/corrupt
    packs instead of SIGBUS-ing later inside mb_batch."""
    _, out = packed
    data = Path(out).read_bytes()
    # truncated mid-data-region
    trunc = tmp_path / "trunc.melbin"
    trunc.write_bytes(data[:len(data) - 16])
    with pytest.raises(IOError):
        MelBinDataset(trunc, lat_dim=64, dlat_dim=128)
    # wrong version (v1 back-to-back layout is rejected: repack)
    import struct
    v1 = tmp_path / "v1.melbin"
    v1.write_bytes(struct.pack("<II", 0x424C454D, 1) + data[8:])
    with pytest.raises(IOError):
        MelBinDataset(v1, lat_dim=64, dlat_dim=128)
    # absurd record count (overflow guard)
    big = tmp_path / "big.melbin"
    big.write_bytes(data[:8] + struct.pack("<Q", 2**61) + data[16:])
    with pytest.raises(IOError):
        MelBinDataset(big, lat_dim=64, dlat_dim=128)


def test_record_payloads_aligned(packed):
    """v2 layout: every record offset is 4-aligned and the float section
    lands on a 4-byte boundary (odd n_text exercised by the fixture)."""
    import struct as _s
    from tortoise_tts_tpu.data.native_loader import (_HEADER_SIZE,
                                                     _INDEX_FMT,
                                                     _INDEX_SIZE)
    _, out = packed
    data = Path(out).read_bytes()
    count = _s.unpack("<Q", data[8:16])[0]
    for i in range(count):
        rec = _s.unpack_from(_INDEX_FMT, data, _HEADER_SIZE + i * _INDEX_SIZE)
        offset, n_codes, n_text = rec[0], rec[1], rec[2]
        assert offset % 4 == 0
        assert (offset + ((n_codes * 2 + n_text + 3) & ~3)) % 4 == 0


def test_truncation(packed):
    _, out = packed
    ds = MelBinDataset(out, lat_dim=64, dlat_dim=128)
    batch = ds.batch([5], text_bucket=4, mel_bucket=8)
    assert batch["text_lengths"][0] == 4
    assert batch["wav_lengths"][0] == 8 * 1024


def test_dataset_uses_native_loader(tmp_path):
    import dataclasses
    from tortoise_tts_tpu.config import (Config, DatasetConfig,
                                         Hyperparameters)
    from tortoise_tts_tpu.data import Dataset
    d = tmp_path / "data" / "g" / "s"
    paths = []
    for i in range(8):
        p = d / f"u{i}.mel"
        _write_artifact(p, n_codes=20 + i, seed=i, dim=1024)
        paths.append(p)
    # pack with full-size latent dims (loader defaults)
    import numpy as np
    for p in paths:  # rewrite latents at full dims
        art = np.load(p, allow_pickle=True)[()]
        art["latent"] = (np.zeros((1, 1024), np.float32),
                         np.zeros((1, 2048), np.float32))
        with open(p, "wb") as f:
            np.save(f, art)
    pack_melbin(paths, tmp_path / "data.melbin")
    cfg = Config(
        yaml_path=str(tmp_path / "cfg.yaml"),
        hyperparameters=Hyperparameters(batch_size=4),
        dataset=DatasetConfig(training=(str(tmp_path / "data"),),
                              validate=False, text_bucket=16, mel_bucket=32,
                              use_melbin=True))
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    assert ds._melbin is not None
    batch = next(ds.batches())
    assert batch["text"].shape == (4, 16)
    assert batch["codes"].shape == (4, 32)
    assert batch["latents"].shape == (4, 1024)


def test_dataset_melbin_row_mapping(tmp_path):
    """Sampler indices address the FILTERED/REORDERED dataset order;
    the pack rows are raw order — the sidecar mapping must reconcile
    them (a mismatch silently trains on wrong utterances)."""
    from tortoise_tts_tpu.config import (Config, DatasetConfig,
                                         Hyperparameters)
    from tortoise_tts_tpu.data import Dataset
    from tortoise_tts_tpu.data.dataset import load_artifact
    import numpy as np
    d = tmp_path / "data" / "g" / "s"
    paths = []
    for i in range(6):
        p = d / f"u{i}.mel"
        _write_artifact(p, n_codes=28 - 3 * i, seed=i, dim=1024)
        paths.append(p)
    for p in paths:
        art = np.load(p, allow_pickle=True)[()]
        art["latent"] = (np.zeros((1, 1024), np.float32),
                         np.zeros((1, 2048), np.float32))
        # durations DESCEND in raw order, so the duration sort reverses
        # the pack order — any index-mapping bug mismatches every row
        with open(p, "wb") as f:
            np.save(f, art)
    pack_melbin(paths, tmp_path / "data.melbin")
    cfg = Config(
        yaml_path=str(tmp_path / "cfg.yaml"),
        hyperparameters=Hyperparameters(batch_size=2),
        dataset=DatasetConfig(training=(str(tmp_path / "data"),),
                              validate=False, text_bucket=16,
                              mel_bucket=64, sample_order="duration",
                              use_melbin=True))
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    assert ds._melbin is not None
    got = ds._native_batch([0, len(ds.paths) - 1])
    for row, idx in ((0, 0), (1, len(ds.paths) - 1)):
        want = np.asarray(load_artifact(ds.paths[idx])["codes"],
                          np.int32)
        n = min(len(want), 64)
        np.testing.assert_array_equal(got["codes"][row, :n], want[:n])
