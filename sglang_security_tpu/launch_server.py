"""CLI entry: ``python -m sglang_security_tpu.launch_server --model-path ...``

Parity with the reference's ``python -m sglang.launch_server``.
"""

from __future__ import annotations

import argparse

from sglang_security_tpu.entrypoints.http_server import launch_server
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.utils import configure_logger


def main() -> None:
    parser = argparse.ArgumentParser(
        description="sglang_security_tpu: TPU-native LLM serving engine"
    )
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args()
    server_args = ServerArgs.from_cli_args(args)
    configure_logger(server_args.log_level)
    launch_server(server_args)


if __name__ == "__main__":
    main()
