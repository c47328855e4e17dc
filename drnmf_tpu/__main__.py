"""`python -m drnmf_tpu` == `python -m drnmf_tpu.cli`."""

from .cli import main

if __name__ == "__main__":
    main()
