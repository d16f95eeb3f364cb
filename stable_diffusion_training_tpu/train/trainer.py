"""Chunked training orchestration — the ``python training.py`` driver.

Behavior parity with ``/root/reference/training.py`` (SURVEY.md §2.1),
including its exact quirks:

- the JSON config is a mutable resume-state store: ``model_path``,
  ``chunk_number``, ``chunk_steps``, ``master_seed`` are rewritten during the
  run, with a ``backup_<name>.json`` taken at startup (L25-28, 301-315);
- pre-flight save probe per chunk: a REAL ``save_model`` (+EMA variant) to
  ``test_save_path``, hard ``sys.exit()`` on failure, probe deleted on
  success (L150-184);
- loss.csv with header ``steps, step_size, loss, time, chunk, seed`` and the
  reference's logging semantics — ``train_metrics`` re-initializes INSIDE the
  loop, so the "avg loss" each interval is the single current step's loss
  (L212-258, documented in SURVEY.md §2.1);
- checkpoints to ``{base}@{chunk_steps}`` (+``-EMA``) with rotation deleting
  ``@{chunk_steps - keep_trained_model_buffer}`` (L260-299);
- DEBUG mode: logging interval //10, loader capped at 100 batches (L111-138);
- compiled-step dispatch keyed on ``batch["pixel_values"].shape`` (L221).

Injection points for tests / alternative data sources: ``dataloader`` and
``tokenizer`` can be passed in, bypassing the streamer-style loader build.
"""

import os
import sys
import time
from typing import Any, Optional

import jax
from tqdm.auto import tqdm

from ..utils.json_io import delete_file_or_folder, read_json_file, save_dict_to_json
from .aot import batch_dispatch_key, dp_compile_all_unique_resolution
from .checkpoint import restore_train_state, save_model, save_train_state
from .config import training_config_from_dict
from .states import on_device_model_training_state

# subfolder inside each diffusers-format chunk checkpoint that carries the
# full training state (optimizer momenta, EMA, RNG) — the piece the reference
# never saved, so every resume silently reset them (SURVEY.md §5.4,
# /root/reference/training.py:301-315)
TRAIN_STATE_SUBDIR = "train_state"


def load_run_config(config_dict_path: str):
    """Read + backup the JSON state file, assert bucket config, build the
    typed subset (reference L25-40)."""
    config_dict = read_json_file(config_dict_path)
    directory, name = os.path.split(config_dict_path)
    save_dict_to_json(config_dict, os.path.join(directory, f"backup_{name}"))
    assert len(config_dict["image_area_root"]) == len(
        config_dict["minimum_axis_length"]
    ), (
        "number of elements in image_area_root and minimum_axis_length is not "
        "match! check your config files!"
    )
    return config_dict, training_config_from_dict(config_dict)


def _build_dataloader(config_dict, config_dict_path, tokenizer):
    from ..data import DataLoader

    return DataLoader(
        tokenizer_obj=tokenizer,
        config=config_dict_path,
        ramdisk_path=config_dict["ramdisk_path"],
        training_batch_size=config_dict["batch_size"],
        repeat_batch=config_dict["repeat_batch"],
        maximum_resolution_areas=[x**2 for x in config_dict["image_area_root"]],
        bucket_lower_bound_resolutions=config_dict["minimum_axis_length"],
        numb_of_worker_thread=config_dict["numb_of_dataloader_worker_thread"],
        queue_get_timeout=config_dict["queue_get_timeout"],
        chunk_number=config_dict["chunk_number"],
        seed=config_dict["master_seed"],
        context_concatenation_multiplier=config_dict[
            "context_window_concatenation_count"
        ],
    )


def _prefetch_to_device(
    dataloader, total: int, context_window: int, mesh, depth: int = 1
):
    """Depth-``k`` host->HBM prefetch: keep up to ``depth`` batches with their
    async device_puts (DP-sharded) in flight while step N executes, so the
    UNet never waits on the H2D transfer (TPU-native data path; the reference
    hands numpy to the compiled call, paying the transfer synchronously at
    dispatch). ``None`` (queue-timeout) entries pass through the buffer
    without stalling the batches already in flight behind them.

    Yields the same (batch | None | 'end_of_batch') stream as
    ``grab_next_batch`` with ids/mask already reshaped to the context window.
    Loaders serve PER-PROCESS batches; ``put_global_batch`` assembles global
    sharded arrays (multi-host pods feed only their own shard — SURVEY §5.8).
    """
    from collections import deque

    from ..core.distributed import put_global_batch

    depth = max(1, int(depth))

    def _grab():
        b = dataloader.grab_next_batch()
        if b is None or isinstance(b, str):
            return b
        b["input_ids"] = b["input_ids"].reshape(-1, context_window)
        b["attention_mask"] = b["attention_mask"].reshape(-1, context_window)
        return put_global_batch(b, mesh)

    buf = deque()
    grabbed = 0
    ended = False

    def _fill():
        # never grab more than `total` items (the loader contract), and stop
        # at end_of_batch — items after it don't exist
        nonlocal grabbed, ended
        while not ended and len(buf) < depth and grabbed < total:
            b = _grab()
            grabbed += 1
            if isinstance(b, str) and b == "end_of_batch":
                ended = True
            buf.append(b)

    for _ in range(total):
        _fill()
        if not buf:
            return
        yield buf.popleft()


def _run_save_probe(
    config_dict, model_object_dict, tokenizer,
    unet_state, text_encoder_state, unet_ema_params, text_encoder_ema_params,
    frozen_vae,
) -> None:
    """Pre-flight probe: a REAL save (+EMA) to test_save_path, hard exit on
    failure, probe deleted on success (reference training.py:150-184)."""
    probe_path = config_dict["test_save_path"]
    try:
        print("trying to save model to check if the saving mechanism works")
        save_model(
            model_object_dict=model_object_dict,
            tokenizer_object=tokenizer,
            unet_params=unet_state.params,
            text_encoder_params=text_encoder_state.params,
            vae_params=frozen_vae.params,
            output_dir=probe_path,
        )
        if config_dict["ema_rate"]:
            save_model(
                model_object_dict=model_object_dict,
                tokenizer_object=tokenizer,
                unet_params=unet_ema_params
                if config_dict["accumulate_unet_ema"]
                else unet_state.params,
                text_encoder_params=text_encoder_ema_params
                if config_dict["accumulate_text_encoder_ema"]
                else text_encoder_state.params,
                vae_params=frozen_vae.params,
                output_dir=f"{probe_path}-EMA",
            )
    except Exception as e:
        print(
            "failed to save model prior to training session! "
            "please check your config or your code first"
        )
        print(f"reason: {e}")
        sys.exit()

    print("save function works as expected deleting the test model")
    delete_file_or_folder(probe_path)
    delete_file_or_folder(f"{probe_path}-EMA")


def _save_chunk_checkpoints(
    config_dict, model_object_dict, tokenizer,
    unet_state, text_encoder_state, unet_ema_params, text_encoder_ema_params,
    frozen_vae, train_rngs=None,
) -> str:
    """Per-chunk checkpoint to {base}@{chunk_steps} (+-EMA) with rotation
    deleting @{chunk_steps - keep_trained_model_buffer}
    (reference training.py:260-299). Returns the new model path."""
    base = config_dict["model_path"].split("@")[0]
    steps = config_dict["chunk_steps"]
    keep = config_dict["keep_trained_model_buffer"]

    latest_model_path = f"{base}@{steps}"
    save_model(
        model_object_dict=model_object_dict,
        tokenizer_object=tokenizer,
        unet_params=unet_state.params,
        text_encoder_params=text_encoder_state.params,
        vae_params=frozen_vae.params,
        output_dir=latest_model_path,
    )
    delete_file_or_folder(f"{base}@{steps - keep}")

    if config_dict["ema_rate"]:
        save_model(
            model_object_dict=model_object_dict,
            tokenizer_object=tokenizer,
            unet_params=unet_ema_params
            if config_dict["accumulate_unet_ema"]
            else unet_state.params,
            text_encoder_params=text_encoder_ema_params
            if config_dict["accumulate_text_encoder_ema"]
            else text_encoder_state.params,
            vae_params=frozen_vae.params,
            output_dir=f"{base}-EMA@{steps}",
        )
        delete_file_or_folder(f"{base}-EMA@{steps - keep}")

    # full training state (optimizer/EMA/RNG) rides inside the checkpoint
    # directory so rotation cleans it up with the chunk; diffusers loaders
    # ignore the extra subfolder
    if train_rngs is not None and config_dict.get("full_state_checkpoint", True):
        save_train_state(
            os.path.join(latest_model_path, TRAIN_STATE_SUBDIR),
            unet_state=unet_state,
            text_encoder_state=text_encoder_state,
            unet_ema_params=unet_ema_params,
            text_encoder_ema_params=text_encoder_ema_params,
            train_rng=train_rngs,
            step_metadata={
                "chunk_steps": steps,
                "chunk_number": config_dict["chunk_number"],
                "master_seed": config_dict["master_seed"],
            },
        )
    return latest_model_path


def _maybe_restore_full_state(
    config_dict,
    unet_state,
    text_encoder_state,
    unet_ema_params,
    text_encoder_ema_params,
    train_rngs,
):
    """Resume optimizer momenta (incl. quantized blocks), EMA buffers, and the
    RNG from the checkpoint's ``train_state`` subfolder when present —
    completing the reference's JSON-path resume, which only reloaded params."""
    state_dir = os.path.join(config_dict["model_path"], TRAIN_STATE_SUBDIR)
    if not (
        config_dict.get("full_state_checkpoint", True) and os.path.isdir(state_dir)
    ):
        return (
            unet_state,
            text_encoder_state,
            unet_ema_params,
            text_encoder_ema_params,
            train_rngs,
        )
    template = {
        "unet_state": unet_state,
        "text_encoder_state": text_encoder_state,
        "unet_ema_params": unet_ema_params if unet_ema_params is not None else {},
        "text_encoder_ema_params": (
            text_encoder_ema_params if text_encoder_ema_params is not None else {}
        ),
        "train_rng": train_rngs,
    }
    restored = restore_train_state(state_dir, template)
    print(f"restored full training state (optimizer/EMA/RNG) from {state_dir}")
    return (
        restored["unet_state"],
        restored["text_encoder_state"],
        restored["unet_ema_params"] if unet_ema_params is not None else None,
        restored["text_encoder_ema_params"]
        if text_encoder_ema_params is not None
        else None,
        restored["train_rng"],
    )


def main(
    config_dict_path: str = "model_properties.json",
    dataloader: Optional[Any] = None,
    tokenizer: Optional[Any] = None,
    mesh=None,
) -> None:
    config_dict, training_config = load_run_config(config_dict_path)

    if tokenizer is None:
        tok_dir = os.path.join(config_dict["model_path"], "tokenizer")
        if os.path.isdir(tok_dir):
            from transformers import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_pretrained(
                config_dict["model_path"], subfolder="tokenizer"
            )

    if dataloader is None:
        dataloader = _build_dataloader(config_dict, config_dict_path, tokenizer)

    if not config_dict["DEBUG"]:
        dataloader._print_debug = False

    train_rngs = jax.random.PRNGKey(config_dict["master_seed"])
    (
        unet_state,
        text_encoder_state,
        unet_ema_params,
        text_encoder_ema_params,
        frozen_vae,
        frozen_schedulers,
        model_object_dict,
    ) = on_device_model_training_state(training_config, mesh=mesh)

    (
        unet_state,
        text_encoder_state,
        unet_ema_params,
        text_encoder_ema_params,
        train_rngs,
    ) = _maybe_restore_full_state(
        config_dict,
        unet_state,
        text_encoder_state,
        unet_ema_params,
        text_encoder_ema_params,
        train_rngs,
    )

    train_step_funcs = dp_compile_all_unique_resolution(
        unet_state,
        text_encoder_state,
        unet_ema_params,
        text_encoder_ema_params,
        frozen_vae,
        frozen_schedulers,
        training_config,
        mesh=mesh,
    )

    if config_dict["DEBUG"]:
        # careful: this mutates the persisted json states, as in the reference
        config_dict["loss_logging_interval"] //= 10
    if not os.path.isfile(config_dict["loss_csv"]):
        with open(config_dict["loss_csv"], "w") as loss_file:
            loss_file.write("steps, step_size, loss, time, chunk, seed\n")

    # first-class profiling (new; the reference only had ad-hoc prints —
    # SURVEY.md §5.1): set "profile_trace_dir" in the config to capture an
    # xplane trace of the first few steps of the first chunk
    profile_trace_dir = config_dict.get("profile_trace_dir")
    profiled = False

    # TensorBoard scalars next to loss.csv (the reference shipped the deps
    # but never wrote summaries — SURVEY.md §5.5); opt-in via config
    from ..utils.metrics import MetricsWriter

    metrics_writer = MetricsWriter(config_dict.get("tensorboard_dir"))
    global_step = 0  # steps this invocation (chunk/seed tagged alongside)

    # in-loop DDIM eval sampling every N steps (BASELINE config 2; opt-in
    # via eval_sample_interval — the reference has no in-loop eval at all)
    from .eval_sampler import EvalSampler

    eval_sampler = EvalSampler(
        config_dict, model_object_dict, tokenizer, metrics_writer
    )

    for _ in range(config_dict["chunk_limit"]):
        dataloader.delete_prev_chunks(prev_chunk=config_dict["chunk_number"] - 1)
        if config_dict["chunk_number"] >= config_dict["chunk_limit"]:
            dataloader.delete_prev_chunks(prev_chunk=config_dict["chunk_number"])
            config_dict["chunk_number"] = 0
        chunk = config_dict["chunk_number"]
        dataloader.chunk_number = chunk
        dataloader.grab_and_prefetch_chunk(
            numb_of_prefetched_batch=config_dict["numb_of_prefetched_batch"],
        )
        dataloader.prepare_training_dataframe()
        dataloader.create_training_dataframe()
        if config_dict["DEBUG"]:
            dataloader._bulk_batch_count = min(dataloader._bulk_batch_count, 100)
        dataloader.dispatch_worker()

        train_step_progress_bar = tqdm(
            total=int(dataloader._bulk_batch_count + dataloader._first_batch_count),
            desc="Training...",
            position=1,
            smoothing=0.3,
            leave=False,
        )

        _run_save_probe(
            config_dict, model_object_dict, tokenizer,
            unet_state, text_encoder_state,
            unet_ema_params, text_encoder_ema_params, frozen_vae,
        )

        start = time.time()

        if profile_trace_dir and not profiled:
            jax.profiler.start_trace(profile_trace_dir)

        total_batches = int(
            dataloader._bulk_batch_count + dataloader._first_batch_count
        )
        from ..core import mesh as mesh_lib

        batch_stream = _prefetch_to_device(
            dataloader,
            total_batches,
            config_dict["text_encoder_context_window"],
            mesh or mesh_lib.get_default_mesh(),
            depth=config_dict.get("device_prefetch_depth", 1),
        )
        for count, current_batch in enumerate(batch_stream):
            if isinstance(current_batch, str) and current_batch == "end_of_batch":
                break
            if current_batch is None:
                continue

            dispatch_key = batch_dispatch_key(current_batch)
            train_step_progress_bar.update(1)
            train_step_progress_bar.set_description(
                desc=f"processing shape [{dispatch_key}]..."
            )

            # reference quirk kept: reset inside the loop, so the logged
            # "avg loss" is the single current step's loss (SURVEY.md §2.1)
            train_metrics = []

            (
                unet_state,
                text_encoder_state,
                unet_ema_params,
                text_encoder_ema_params,
                train_metric,
                train_rngs,
            ) = train_step_funcs[dispatch_key](
                unet_state,
                text_encoder_state,
                unet_ema_params,
                text_encoder_ema_params,
                current_batch,
                train_rngs,
                frozen_vae,
                frozen_schedulers,
            )

            # loss futures accumulate without forcing a device sync
            train_metrics.append(train_metric["loss"])

            if profile_trace_dir and not profiled and count >= min(
                4, config_dict["loss_logging_interval"]
            ):
                jax.block_until_ready(train_metric["loss"])
                jax.profiler.stop_trace()
                profiled = True

            global_step += 1
            if eval_sampler.active:
                sampled = eval_sampler.maybe_sample(
                    global_step,
                    unet_state.params,
                    text_encoder_state.params,
                    frozen_vae.params,
                    train_rngs,
                )
                if sampled:
                    train_step_progress_bar.write(
                        f"eval samples at step {global_step} -> {sampled}"
                    )
            if count % config_dict["loss_logging_interval"] == 0:
                stop = time.time()
                time_elapsed = round(stop - start, 4)
                loss = sum(train_metrics) / len(train_metrics)
                time_per_step = round(
                    time_elapsed / config_dict["loss_logging_interval"], 4
                )
                start = time.time()
                if metrics_writer.active:
                    metrics_writer.scalar("train/loss", float(loss), global_step)
                    metrics_writer.scalar(
                        "train/step_time_s", time_per_step, global_step
                    )
                    metrics_writer.scalar(
                        "train/chunk", config_dict["chunk_steps"], global_step
                    )
                    # flush per logging interval: a killed run must not lose
                    # the buffered tail of its event file
                    metrics_writer.flush()
                train_step_progress_bar.write(
                    f"at steps {count}, avg loss for "
                    f'{config_dict["loss_logging_interval"]} steps: {loss},'
                    f"took {time_elapsed} second(s) or {time_per_step} "
                    "second(s) per step"
                )
                with open(config_dict["loss_csv"], "a") as loss_file:
                    loss_file.write(
                        f'\n{count},{config_dict["loss_logging_interval"]},'
                        f'{loss},{time_elapsed},{config_dict["chunk_steps"]},'
                        f'{config_dict["master_seed"]}'
                    )

        config_dict["model_path"] = _save_chunk_checkpoints(
            config_dict, model_object_dict, tokenizer,
            unet_state, text_encoder_state,
            unet_ema_params, text_encoder_ema_params, frozen_vae,
            train_rngs=train_rngs,
        )
        config_dict["chunk_number"] += 1
        config_dict["chunk_steps"] += 1
        save_dict_to_json(config_dict, config_dict_path)

    # flush temp storage
    for flushed_batch in range(
        config_dict["chunk_limit"] + config_dict["numb_of_prefetched_batch"] + 1
    ):
        dataloader.delete_prev_chunks(prev_chunk=flushed_batch)

    config_dict["master_seed"] += 1
    save_dict_to_json(config_dict, config_dict_path)
    metrics_writer.close()
