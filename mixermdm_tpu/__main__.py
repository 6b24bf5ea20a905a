"""Top-level CLI dispatcher: ``python -m mixermdm_tpu <command> ...``.

Commands mirror the reference's ``src/scripts/{train,infer,eval}`` tree
(README.md:46-56).
"""

import sys

COMMANDS = {
    "infer-mixermdm": ("mixermdm_tpu.cli.infer_mixermdm", "MixerMDM inference"),
    "infer-in2in": ("mixermdm_tpu.cli.infer_in2in", "in2IN / DualMDM inference"),
    "infer-mdm": ("mixermdm_tpu.cli.infer_mdm", "MDM inference"),
    "train-mixermdm": ("mixermdm_tpu.cli.train_mixermdm", "adversarial mixer training"),
    "train-in2in": ("mixermdm_tpu.cli.train_in2in", "base model training (in2IN/MDM)"),
    "train-finetuned": ("mixermdm_tpu.cli.train_finetuned", "individual->interaction finetune"),
    "train-evaluator": ("mixermdm_tpu.cli.train_evaluator", "InterCLIP evaluator training"),
    "eval-mixermdm": ("mixermdm_tpu.cli.eval_mixermdm", "evaluation protocol"),
    "eval-base": ("mixermdm_tpu.cli.eval_base", "base-model evaluation (in2IN/DualMDM/MDM)"),
    "serve": ("mixermdm_tpu.cli.serve", "warm-compiled HTTP generation server"),
    "convert": ("mixermdm_tpu.cli.convert", "torch .ckpt -> orbax checkpoint"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m mixermdm_tpu <command> [args...]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:18s} {desc}")
        return 0 if len(sys.argv) >= 2 else 1
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; try --help")
        return 1
    import importlib

    module = importlib.import_module(COMMANDS[cmd][0])
    return module.main(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main() or 0)
