"""HF-Hub chunk-fetch path, validated WITHOUT egress: a fake on-disk repo is
served through a monkeypatched ``hf_hub_download``, covering the zip / tar /
csv layouts and the per-repo column mappings of
``/root/reference/model_properties_example.json:60-87``, plus the
path-traversal guards and the loud-failure behavior for misconfigured repos.
"""

import csv
import io
import os
import tarfile
import zipfile

import numpy as np
import pytest

from stable_diffusion_training_tpu.data.dataloader import DataLoader


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __call__(self, captions, add_special_tokens=False):
        # deterministic "tokenization": bytes of the caption, small vocab
        return {
            "input_ids": [[3 + (b % 96) for b in c.encode()][:64] for c in captions]
        }


def _png_bytes(w, h, color):
    from PIL import Image

    im = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def _csv_bytes(rows, fn_col, cap_col, w_col, h_col):
    buf = io.StringIO()
    writer = csv.writer(buf)
    writer.writerow([fn_col, cap_col, w_col, h_col])
    writer.writerows(rows)
    return buf.getvalue().encode()


@pytest.fixture
def fake_hub(tmp_path, monkeypatch):
    """Materialize fake hub files and monkeypatch hf_hub_download to serve
    them from disk; raises FileNotFoundError for anything not staged."""
    hub_dir = tmp_path / "hub"
    hub_dir.mkdir()

    def stage(repo_id, filename, data: bytes):
        path = hub_dir / repo_id.replace("/", "__") / filename
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(data)
        return str(path)

    def fake_download(repo_id, filename, repo_type=None, token=None):
        path = hub_dir / repo_id.replace("/", "__") / filename
        if not path.exists():
            raise FileNotFoundError(f"{repo_id}/{filename} not staged")
        return str(path)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)
    return stage


def _loader(tmp_path, repo_cfg, batch_size=2):
    config = {"repo": repo_cfg, "token": None}
    return DataLoader(
        tokenizer_obj=FakeTokenizer(),
        config=config,
        ramdisk_path=str(tmp_path / "ramdisk"),
        training_batch_size=batch_size,
        repeat_batch=1,
        maximum_resolution_areas=[64 * 64],
        bucket_lower_bound_resolutions=[64],
        numb_of_worker_thread=2,
        queue_get_timeout=5,
        chunk_number=0,
        seed=0,
        context_concatenation_multiplier=3,
    )


def test_zip_chunk_end_to_end(tmp_path, fake_hub):
    """zip archive + csv metadata with custom column names -> real batches."""
    n = 4
    files = {f"img_{i}.png": _png_bytes(80, 64, (i * 40, 10, 10)) for i in range(n)}
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    fake_hub("org/data", "chunks/pre-0.zip", zbuf.getvalue())
    fake_hub(
        "org/data",
        "chunks/pre-0.csv",
        _csv_bytes(
            [[name, f"tag a, tag b, caption {i}", 80, 64]
             for i, name in enumerate(files)],
            "file_name", "tags", "w_px", "h_px",
        ),
    )

    loader = _loader(
        tmp_path,
        {
            "repo_0": {
                "name": "org/data",
                "prefix": "pre-",
                "total_file_count": 1,
                "folder_path_in_repo": "chunks",
                "filename_col": "file_name",
                "caption_col": "tags",
                "image_width_col_name": "w_px",
                "image_height_col_name": "h_px",
                "coma_separated_shuffle": True,
                "max_tag_count": 2,
                "drop_caption_ratio": 0.9,
            }
        },
    )
    loader.grab_and_prefetch_chunk(numb_of_prefetched_batch=0)
    loader.prepare_training_dataframe()
    assert len(loader._dataframe) == n
    loader.create_training_dataframe()
    assert loader._first_batch_count + loader._bulk_batch_count == n // 2
    loader.dispatch_worker()

    seen = 0
    while True:
        batch = loader.grab_next_batch()
        if isinstance(batch, str) and batch == "end_of_batch":
            break
        if batch is None:
            continue
        assert batch["pixel_values"].shape[0] == 2
        assert batch["pixel_values"].dtype == np.float32
        assert batch["input_ids"].shape == (2, 3 * 77)
        seen += 1
    assert seen == n // 2


def test_tar_chunk_prepare(tmp_path, fake_hub):
    """tar archive layout extracts through the 'data' filter."""
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        data = _png_bytes(64, 64, (5, 5, 5))
        info = tarfile.TarInfo("a.png")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    fake_hub("org/tars", "t0.tar", tbuf.getvalue())
    fake_hub(
        "org/tars",
        "t0.csv",
        _csv_bytes([["a.png", "hello", 64, 64]],
                   "filename", "caption", "image_width", "image_height"),
    )

    loader = _loader(
        tmp_path,
        {"repo_0": {"name": "org/tars", "prefix": "t", "total_file_count": 1}},
        batch_size=1,
    )
    loader.grab_and_prefetch_chunk(numb_of_prefetched_batch=0)
    loader.prepare_training_dataframe()
    assert len(loader._dataframe) == 1
    assert os.path.exists(loader._dataframe.iloc[0]["filepath"])


def test_zip_path_traversal_rejected(tmp_path, fake_hub):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("../evil.txt", b"pwned")
    fake_hub("org/evil", "e0.zip", zbuf.getvalue())

    loader = _loader(
        tmp_path,
        {"repo_0": {"name": "org/evil", "prefix": "e", "total_file_count": 1}},
    )
    with pytest.raises(ValueError, match="escapes extraction dir"):
        loader._fetch_one_chunk(0)
    assert not (tmp_path / "evil.txt").exists()


def test_tar_path_traversal_rejected(tmp_path, fake_hub):
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        data = b"pwned"
        info = tarfile.TarInfo("../evil.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    fake_hub("org/evil2", "e0.tar", tbuf.getvalue())

    loader = _loader(
        tmp_path,
        {"repo_0": {"name": "org/evil2", "prefix": "e", "total_file_count": 1}},
    )
    with pytest.raises(tarfile.FilterError):
        loader._fetch_one_chunk(0)
    assert not (tmp_path / "evil.txt").exists()


def test_missing_repo_warns_loudly(tmp_path, fake_hub, capsys):
    """A repo yielding no files at all must be reported, not silently empty
    (the reference-era silent `except: continue` hid misconfiguration)."""
    loader = _loader(
        tmp_path,
        {"repo_0": {"name": "org/nothing", "prefix": "x", "total_file_count": 1}},
    )
    loader._fetch_one_chunk(0)
    out = capsys.readouterr().out
    assert "WARNING" in out and "org/nothing" in out and "x0.zip" in out


def test_chunk_index_wraps_by_total_file_count(tmp_path, fake_hub):
    fake_hub(
        "org/wrap",
        "c1.csv",
        _csv_bytes([["a.png", "cap", 64, 64]],
                   "filename", "caption", "image_width", "image_height"),
    )
    loader = _loader(
        tmp_path,
        {"repo_0": {"name": "org/wrap", "prefix": "c", "total_file_count": 3}},
    )
    # chunk 4 % total_file_count 3 -> file index 1
    loader._fetch_one_chunk(4)
    dest = os.path.join(loader._chunk_dir(4), "repo_0", "c1.csv")
    assert os.path.exists(dest)
