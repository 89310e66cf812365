from benchmarks.runner import main
import sys
sys.exit(main())
