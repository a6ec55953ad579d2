"""Inference-server CLI (see aaclip_tpu/serve/server.py)."""

from aaclip_tpu.serve.server import main

if __name__ == "__main__":
    main()
