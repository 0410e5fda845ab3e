from kanzi_tpu.app.cli import main
import sys

sys.exit(main())
