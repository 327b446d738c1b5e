"""Command-line batch tool (placeholder; full CLI lands with the pipeline)."""


def main() -> int:
    print("raw2film-tpu: pipeline CLI not yet wired")
    return 0
