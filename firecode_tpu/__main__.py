from firecode_tpu.cli import main

main()
