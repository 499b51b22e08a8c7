"""Manually (re-)register a worker with the controller.

Parity target: /root/reference llava/serve/register_worker.py — POST
/register_worker with `worker_status: None`, which makes the controller
probe the worker's own /worker_get_status and refuse unreachable ones.

Usage:
  python -m rsvldm_tpu.serving.register_worker \
      --controller-address http://localhost:21001 \
      --worker-name http://localhost:21002
"""

from __future__ import annotations

from .http_util import post_json


def main(argv=None) -> bool:
    import argparse
    ap = argparse.ArgumentParser(description="manually register a worker")
    ap.add_argument("--controller-address", type=str,
                    default="http://localhost:21001")
    ap.add_argument("--worker-name", type=str, required=True,
                    help="the worker's advertised URL")
    args = ap.parse_args(argv)
    # no model_names == the reference's worker_status: None — the
    # controller probes the worker itself (register_worker.py:20-25)
    out = post_json(args.controller_address + "/register_worker",
                    {"worker_name": args.worker_name})
    ok = bool(out.get("ok"))
    print(f"register {args.worker_name}: {'ok' if ok else 'FAILED'}",
          flush=True)
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if main() else 1)
