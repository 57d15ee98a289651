from madicp_tpu.apps.cli import run

run()
