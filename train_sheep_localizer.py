#!/usr/bin/env python
"""Reference CLI surface shim -> `loans_tpu.cli.train_localizer`."""

from loans_tpu.cli.train_localizer import main

if __name__ == "__main__":
    main()
