from lvllm_tpu.entrypoints.cli import main

main()
