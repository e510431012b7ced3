from sos_rt_tpu.cli import main

main()
