"""Runnable CLI examples (reference: metadrive/examples/*).

Each module is a `python -m metadrive_ped_tpu.examples.<name>` entry point,
mirroring the reference's example scripts but driving the batched TPU
simulator. All run headless; pass --cpu to force the CPU backend.
"""


def force_cpu_flag(parser):
    parser.add_argument("--cpu", action="store_true", help="force the CPU jax backend")


def maybe_force_cpu(args):
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
