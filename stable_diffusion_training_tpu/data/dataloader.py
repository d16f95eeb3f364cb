"""Streamer-equivalent chunked data loader.

Rebuild of the reference's ``streamer`` submodule (API reconstructed from call
sites; SURVEY.md §2.9): HF-Hub chunk fetch to a ramdisk, aspect-ratio bucket
assignment (same grid math as the AOT compiler), caption tag shuffle/drop,
Nx77-window tokenization, threaded decode workers filling a bounded queue, and
the ``grab_next_batch`` / ``None`` / ``"end_of_batch"`` protocol
(``/root/reference/training.py:49-81, 120-209``).

Chunk format assumptions (the upstream streamer repo is not vendored in the
reference snapshot): each repo hosts archives ``{folder}/{prefix}{i}.zip`` (or
``.tar``), or bare image directories, with per-image metadata in either a
per-chunk CSV ``{prefix}{i}.csv`` or the repo-level ``csv_path`` file. The CSV
column names come from the repo config (``filename_col``, ``caption_col``,
``image_width_col_name``, ``image_height_col_name``;
``/root/reference/model_properties_example.json:60-87``).

TPU-first data path: decode/resize happens on host worker threads while the
accelerator runs the previous step; the trainer overlaps ``jax.device_put`` of
the next batch with the current step (double-buffered H2D prefetch lives in
``train.loop``).
"""

import os
import queue
import tarfile
import threading
import zipfile
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.json_io import delete_file_or_folder, read_json_file
from .buckets import assign_bucket, calculate_resolution_array


def _shuffle_and_drop_tags(
    caption: str,
    rng: np.random.Generator,
    coma_separated_shuffle: bool,
    max_tag_count: Optional[int],
    drop_caption_ratio: Optional[float],
    caption_drop_mode: str = "tags",
) -> str:
    """Caption augmentation. ``drop_caption_ratio`` semantics depend on the
    per-repo ``caption_drop_mode`` (the upstream streamer repo is not in the
    reference snapshot, so the knob's meaning is ambiguous — see
    ``/root/reference/model_properties_example.json:60-87``; both
    conventions exist in the wild and are supported explicitly):

    - ``"tags"`` (default): keep that FRACTION of the shuffled
      comma-separated tags (tag-level caption thinning; requires
      ``coma_separated_shuffle``);
    - ``"whole"``: drop the ENTIRE caption with that PROBABILITY (the
      classifier-free-guidance unconditional-training convention).
    """
    if caption_drop_mode == "whole":
        if drop_caption_ratio and rng.random() < float(drop_caption_ratio):
            return ""
    elif caption_drop_mode != "tags":
        raise ValueError(
            f"caption_drop_mode must be 'tags' or 'whole', got {caption_drop_mode!r}"
        )
    if not coma_separated_shuffle:
        return caption
    tags = [t.strip() for t in caption.split(",") if t.strip()]
    rng.shuffle(tags)
    if drop_caption_ratio and caption_drop_mode == "tags":
        keep = max(1, int(round(len(tags) * float(drop_caption_ratio))))
        tags = tags[:keep]
    if max_tag_count:
        tags = tags[: int(max_tag_count)]
    return ", ".join(tags)


def tokenize_concat_windows(
    tokenizer,
    captions: Sequence[str],
    context_window: int = 77,
    concat_count: int = 3,
) -> Dict[str, np.ndarray]:
    """Tokenize long captions into ``concat_count`` BOS/EOS-wrapped windows.

    Each 77-token window carries its own BOS/EOS (the train step strips the
    inner ones back out, reference ``training_utils.py:649-674``). Content
    capacity is ``(context_window - 2) * concat_count`` tokens.
    """
    bos = tokenizer.bos_token_id
    eos = tokenizer.eos_token_id
    pad = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else eos
    content_len = context_window - 2

    ids_out = np.full(
        (len(captions), concat_count * context_window), pad, dtype=np.int32
    )
    mask_out = np.zeros_like(ids_out)

    encoded = tokenizer(list(captions), add_special_tokens=False)["input_ids"]
    for row, content in enumerate(encoded):
        content = content[: content_len * concat_count]
        for win in range(concat_count):
            chunk = content[win * content_len : (win + 1) * content_len]
            window = [bos] + list(chunk) + [eos]
            window += [pad] * (context_window - len(window))
            start = win * context_window
            ids_out[row, start : start + context_window] = window
            mask_out[row, start : start + len(chunk) + 2] = 1
    return {"input_ids": ids_out, "attention_mask": mask_out}


def load_and_bucket_image(path: str, bucket_wh) -> Optional[np.ndarray]:
    """Decode, resize (preserving aspect), center-crop to the bucket, and
    normalize to [-1, 1]; returns CHW float32 or None on decode failure."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB")
            bw, bh = int(bucket_wh[0]), int(bucket_wh[1])
            scale = max(bw / im.width, bh / im.height)
            new_w = max(bw, int(round(im.width * scale)))
            new_h = max(bh, int(round(im.height * scale)))
            im = im.resize((new_w, new_h), Image.BICUBIC)
            left = (new_w - bw) // 2
            top = (new_h - bh) // 2
            im = im.crop((left, top, left + bw, top + bh))
            arr = np.asarray(im, dtype=np.float32) / 127.5 - 1.0
            return arr.transpose(2, 0, 1)  # HWC -> CHW
    except Exception:
        return None


class DataLoader:
    """Chunked HF-Hub dataset loader with aspect-ratio bucketing.

    Constructor signature matches the reference call site
    (``/root/reference/training.py:49-81``).
    """

    def __init__(
        self,
        tokenizer_obj,
        config,
        ramdisk_path: str,
        training_batch_size: int,
        repeat_batch: int,
        maximum_resolution_areas: Sequence[int],
        bucket_lower_bound_resolutions: Sequence[int],
        numb_of_worker_thread: int = 4,
        queue_get_timeout: float = 60.0,
        chunk_number: int = 0,
        seed: int = 0,
        context_concatenation_multiplier: int = 3,
        context_window: int = 77,
        queue_max_size: int = 32,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.tokenizer = tokenizer_obj
        self.config = read_json_file(config) if isinstance(config, str) else dict(config)
        self.ramdisk_path = ramdisk_path
        self.batch_size = training_batch_size
        self.repeat_batch = repeat_batch
        self.max_res_areas = list(maximum_resolution_areas)
        self.bucket_lower_bounds = list(bucket_lower_bound_resolutions)
        self.num_workers = numb_of_worker_thread
        self.queue_get_timeout = queue_get_timeout
        self.chunk_number = chunk_number
        self.seed = seed
        self.concat_count = context_concatenation_multiplier
        self.context_window = context_window
        # per-host data sharding for pods (SURVEY.md §5.8): every process
        # builds the SAME batch plan (same seed -> same shapes/sequence, so
        # all hosts dispatch the same compiled programs in lockstep) but
        # decodes only its slice; the trainer assembles global arrays via
        # core.distributed.put_global_batch
        if training_batch_size % process_count:
            raise ValueError(
                f"training_batch_size={training_batch_size} must divide "
                f"evenly across process_count={process_count} hosts"
            )
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch_size = training_batch_size // process_count

        self._print_debug = True
        self._bulk_batch_count = 0
        self._first_batch_count = 0

        rounding = int(self.config.get("bucket_rounding", 64))
        self._resolutions = np.concatenate(
            [
                calculate_resolution_array(area, lower, rounding)
                for area, lower in zip(self.max_res_areas, self.bucket_lower_bounds)
            ]
        )
        self._dataframe = None  # pandas DataFrame of (filepath, caption, w, h, repo)
        self._batches: List[dict] = []  # list of work items (metadata only)
        self._queue: queue.Queue = queue.Queue(maxsize=queue_max_size)
        self._workers: List[threading.Thread] = []
        self._work_queue: queue.Queue = queue.Queue()
        self._producers_done = threading.Event()
        self._outstanding = 0
        self._outstanding_lock = threading.Lock()
        # multi-process lockstep (pods): workers finish in nondeterministic
        # order, so batches are released to the consumer queue strictly in
        # plan order via a reorder buffer — every host then steps through
        # the identical logical batch sequence
        self._reorder: dict = {}
        self._next_emit = 0
        self._reorder_lock = threading.Lock()
        self._emit_lock = threading.Lock()  # serializes ordered queue puts

        os.makedirs(ramdisk_path, exist_ok=True)

    def _debug(self, msg: str) -> None:
        if self._print_debug:
            print(f"[dataloader] {msg}")

    # --- chunk fetch ---------------------------------------------------------
    def _chunk_dir(self, chunk: int) -> str:
        return os.path.join(self.ramdisk_path, f"chunk_{chunk}")

    def delete_prev_chunks(self, prev_chunk: int) -> None:
        delete_file_or_folder(self._chunk_dir(prev_chunk))

    @staticmethod
    def _safe_extract_zip(archive_path: str, dest: str) -> None:
        """Extract refusing absolute / parent-escaping member paths
        (path-traversal guard on downloaded archives)."""
        with zipfile.ZipFile(archive_path) as zf:
            dest_real = os.path.realpath(dest)
            for member in zf.namelist():
                resolved = os.path.realpath(os.path.join(dest, member))
                if not resolved.startswith(dest_real + os.sep) and resolved != dest_real:
                    raise ValueError(
                        f"archive member escapes extraction dir: {member!r}"
                    )
            zf.extractall(dest)

    def _fetch_one_chunk(self, chunk: int) -> None:
        """Download + extract every repo's archive for ``chunk``.

        A repo whose chunk yields NO file at all (neither archive nor csv) is
        reported loudly — a misconfigured repo must not look like an empty
        chunk (each per-extension miss is expected; all three missing is not).
        """
        target = self._chunk_dir(chunk)
        if os.path.isdir(target) and os.listdir(target):
            return  # already fetched
        os.makedirs(target, exist_ok=True)
        token = self.config.get("token")
        repos = self.config.get("repo", {})
        from huggingface_hub import hf_hub_download

        for repo_key, repo_cfg in repos.items():
            repo_id = repo_cfg.get("name")
            if repo_id is None:
                continue  # local csv-only repo handled in prepare step
            prefix = repo_cfg.get("prefix", "")
            folder = repo_cfg.get("folder_path_in_repo", "")
            file_index = chunk % int(repo_cfg.get("total_file_count", 1))
            fetched, errors = [], []
            for ext in (".zip", ".tar", ".csv"):
                fname = f"{prefix}{file_index}{ext}"
                rel = os.path.join(folder, fname) if folder else fname
                try:
                    local = hf_hub_download(
                        repo_id=repo_id,
                        filename=rel,
                        repo_type="dataset",
                        token=token,
                    )
                except Exception as e:  # missing ext is expected; record it
                    errors.append(f"{rel}: {type(e).__name__}: {e}")
                    continue
                dest = os.path.join(target, repo_key)
                os.makedirs(dest, exist_ok=True)
                if ext == ".zip":
                    self._safe_extract_zip(local, dest)
                elif ext == ".tar":
                    with tarfile.open(local) as tf:
                        # "data" filter rejects absolute paths, .. escapes,
                        # device nodes and other path-traversal vectors
                        tf.extractall(dest, filter="data")
                else:
                    import shutil

                    shutil.copy(local, os.path.join(dest, fname))
                fetched.append(fname)
            if fetched:
                self._debug(f"fetched chunk {chunk} for {repo_key}: {fetched}")
            else:
                print(
                    f"[dataloader] WARNING: no chunk file found for repo "
                    f"{repo_key!r} ({repo_id}) chunk {chunk}; tried: "
                    + "; ".join(errors)
                )

    def grab_and_prefetch_chunk(self, numb_of_prefetched_batch: int = 1) -> None:
        """Fetch the current chunk synchronously; prefetch the next N async."""
        self._fetch_one_chunk(self.chunk_number)
        for ahead in range(1, numb_of_prefetched_batch + 1):
            threading.Thread(
                target=self._fetch_one_chunk,
                args=(self.chunk_number + ahead,),
                daemon=True,
            ).start()

    # --- dataframe prep ------------------------------------------------------
    def prepare_training_dataframe(self) -> None:
        """Collect per-image metadata rows for the current chunk."""
        import pandas as pd

        chunk_dir = self._chunk_dir(self.chunk_number)
        frames = []
        for repo_key, repo_cfg in self.config.get("repo", {}).items():
            repo_dir = os.path.join(chunk_dir, repo_key)
            csv_candidates = []
            if os.path.isdir(repo_dir):
                csv_candidates = [
                    os.path.join(repo_dir, f)
                    for f in os.listdir(repo_dir)
                    if f.endswith(".csv")
                ]
            if not csv_candidates and repo_cfg.get("csv_path"):
                if os.path.exists(repo_cfg["csv_path"]):
                    csv_candidates = [repo_cfg["csv_path"]]
            for csv_path in csv_candidates:
                df = pd.read_csv(csv_path)
                fn_col = repo_cfg.get("filename_col", "filename")
                cap_col = repo_cfg.get("caption_col", "caption")
                w_col = repo_cfg.get("image_width_col_name", "image_width")
                h_col = repo_cfg.get("image_height_col_name", "image_height")
                sub = pd.DataFrame(
                    {
                        "filepath": df[fn_col].map(
                            lambda f: os.path.join(repo_dir, str(f))
                        ),
                        "caption": df[cap_col].astype(str),
                        "width": df[w_col].astype(int),
                        "height": df[h_col].astype(int),
                        "repo_key": repo_key,
                    }
                )
                frames.append(sub)
        self._dataframe = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                columns=["filepath", "caption", "width", "height", "repo_key"]
            )
        )
        self._debug(f"prepared dataframe with {len(self._dataframe)} rows")

    def create_training_dataframe(self) -> None:
        """Assign buckets, group into fixed-size batches, shuffle bucket-aware.

        ``repeat_batch`` keeps that many same-resolution batches adjacent so
        the trainer doesn't ping-pong between compiled programs
        (reference ``training.py:56-58``).
        """
        rng = np.random.default_rng(self.seed + self.chunk_number)
        df = self._dataframe
        if df is None or len(df) == 0:
            self._batches = []
            self._bulk_batch_count = 0
            self._first_batch_count = 0
            return

        buckets: Dict[tuple, list] = {}
        order = rng.permutation(len(df))
        for idx in order:
            row = df.iloc[int(idx)]
            wh = assign_bucket(row["width"], row["height"], self._resolutions)
            buckets.setdefault(wh, []).append(int(idx))

        # fixed-size batches per bucket (drop ragged remainder: shapes are AOT)
        per_bucket_batches: Dict[tuple, list] = {}
        for wh, indices in buckets.items():
            n_full = len(indices) // self.batch_size
            per_bucket_batches[wh] = [
                indices[i * self.batch_size : (i + 1) * self.batch_size]
                for i in range(n_full)
            ]

        # interleave groups of `repeat_batch` same-resolution batches
        groups = []
        for wh, batch_list in per_bucket_batches.items():
            for i in range(0, len(batch_list), self.repeat_batch):
                groups.append((wh, batch_list[i : i + self.repeat_batch]))
        rng.shuffle(groups)

        self._batches = []
        for wh, group in groups:
            for indices in group:
                self._batches.append({"resolution": wh, "indices": indices})
        # the reference trainer treats first/bulk as DISTINCT totals and
        # sums them for the loop bound + progress bar
        # (/root/reference/training.py:142-143,190); the streamer's "first"
        # set is the batch group available as soon as dispatch starts, so
        # count the first same-resolution group as "first" and the rest as
        # "bulk". DEBUG capping (trainer) touches only _bulk_batch_count,
        # exactly like the reference.
        self._first_batch_count = min(self.repeat_batch, len(self._batches))
        self._bulk_batch_count = len(self._batches) - self._first_batch_count
        self._debug(
            f"created {len(self._batches)} batches across {len(buckets)} buckets"
        )

    # --- worker pool ----------------------------------------------------------
    def _worker_loop(self) -> None:
        rng = np.random.default_rng(
            (self.seed, self.chunk_number, threading.get_ident() % (2**31))
        )
        while True:
            try:
                item = self._work_queue.get(timeout=0.25)
            except queue.Empty:
                if self._producers_done.is_set():
                    return
                continue
            batch = self._build_batch(item, rng)
            if self.process_count > 1:
                # ordered emission: park out-of-order results, flush the
                # contiguous prefix (a None slot still advances the cursor
                # so hosts cannot desynchronize on it). The blocking
                # consumer-queue put happens under a dedicated emit lock —
                # never under _reorder_lock, which dispatch_worker also
                # takes between chunks (holding it across a full-queue put
                # would deadlock the next chunk) — and the emit lock keeps
                # concurrent flushers from interleaving out of order.
                with self._reorder_lock:
                    self._reorder[item["seq"]] = batch
                while True:
                    with self._emit_lock:
                        with self._reorder_lock:
                            if self._next_emit not in self._reorder:
                                break
                            ready = self._reorder.pop(self._next_emit)
                            self._next_emit += 1
                        if ready is not None:
                            self._queue.put(ready)
            elif batch is not None:
                self._queue.put(batch)
            with self._outstanding_lock:
                self._outstanding -= 1

    def _build_batch(self, item: dict, rng) -> Optional[dict]:
        df = self._dataframe
        wh = item["resolution"]
        # decode only this host's slice of the global batch
        lo = self.process_index * self.local_batch_size
        local_indices = item["indices"][lo : lo + self.local_batch_size]
        pixels, captions = [], []
        for idx in local_indices:
            row = df.iloc[idx]
            arr = load_and_bucket_image(row["filepath"], wh)
            if arr is None:
                if self.process_count > 1:
                    # a per-host skip would desynchronize the pod's batch
                    # sequence (other hosts decode their slices fine and
                    # step; the collective hangs) — substitute a blank
                    # image deterministically instead
                    self._debug(
                        f"decode failed for {row['filepath']}; substituting "
                        "blank image to keep hosts in lockstep"
                    )
                    arr = np.zeros((3, int(wh[1]), int(wh[0])), np.float32)
                else:
                    continue
            repo_cfg = self.config.get("repo", {}).get(row["repo_key"], {})
            captions.append(
                _shuffle_and_drop_tags(
                    row["caption"],
                    rng,
                    repo_cfg.get("coma_separated_shuffle", False),
                    repo_cfg.get("max_tag_count"),
                    repo_cfg.get("drop_caption_ratio"),
                    repo_cfg.get("caption_drop_mode", "tags"),
                )
            )
            pixels.append(arr)
        if len(pixels) < self.local_batch_size:
            return None  # decode failures broke the static batch shape
        toks = tokenize_concat_windows(
            self.tokenizer, captions, self.context_window, self.concat_count
        )
        return {
            "pixel_values": np.stack(pixels).astype(np.float32),
            "input_ids": toks["input_ids"],
            "attention_mask": toks["attention_mask"],
        }

    def dispatch_worker(self) -> None:
        """Start worker threads that fill the batch queue."""
        self._producers_done.clear()
        with self._outstanding_lock:
            self._outstanding = len(self._batches)
        with self._reorder_lock:
            self._reorder.clear()
            self._next_emit = 0
        for seq, item in enumerate(self._batches):
            self._work_queue.put({**item, "seq": seq})
        self._producers_done.set()
        self._workers = []
        for _ in range(self.num_workers):
            t = threading.Thread(target=self._worker_loop, daemon=True)
            t.start()
            self._workers.append(t)

    def grab_next_batch(self):
        """Batch dict, None (timeout / transient miss), or 'end_of_batch'."""
        with self._outstanding_lock:
            drained = self._outstanding <= 0
        if drained and self._queue.empty():
            return "end_of_batch"
        try:
            return self._queue.get(timeout=self.queue_get_timeout)
        except queue.Empty:
            with self._outstanding_lock:
                drained = self._outstanding <= 0
            return "end_of_batch" if drained else None
