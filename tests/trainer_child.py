"""Child process for trainer e2e tests: run ``trainer.main`` with the
standard synthetic in-memory loader against a config JSON path.

The heavy trainer tests run in fresh subprocesses because XLA:CPU's JIT
becomes unstable late in a single long-lived process (segfaults in
executable load/compile after ~170 tests' worth of compiled programs);
the e2e tests are CLI-style anyway — every assertion reads on-disk
artifacts (loss.csv, config JSON, checkpoints, PNGs) back in the parent.
"""

import os
import sys


def main() -> None:
    config_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from stable_diffusion_training_tpu.data import InMemoryDataLoader
    from stable_diffusion_training_tpu.train import trainer

    loader = InMemoryDataLoader.synthetic(
        4, 8, [(64, 64)], concat_count=3, vocab_size=1000, seed=0
    )
    trainer.main(config_dict_path=config_path, dataloader=loader, tokenizer=None)


if __name__ == "__main__":
    main()
