from cacophony_tpu.eval.cli import main

main()
