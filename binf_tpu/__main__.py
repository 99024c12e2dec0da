from binf_tpu.cli import main

main()
