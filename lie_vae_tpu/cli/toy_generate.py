"""Toy dataset generator CLI: python -m lie_vae_tpu.cli.toy_generate N DEGREES COPIES.

Reference: lie_vae/experiments/toy_generate.py.
"""
import argparse

from lie_vae_tpu.data import ToyDataset


def main(argv=None):
    parser = argparse.ArgumentParser("Toy data generator")
    parser.add_argument("num", type=int)
    parser.add_argument("degrees", type=int)
    parser.add_argument("rep_copies", type=int)
    parser.add_argument("--path", default="data/toy.npz")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    ToyDataset.generate(n=args.num, degrees=args.degrees,
                        rep_copies=args.rep_copies,
                        seed=args.seed).save(args.path)
    print("Dataset generated")


if __name__ == "__main__":
    main()
