// Shim stub: sift.cpp includes <vigra/impex.hxx> but uses nothing from it
// (image import lives in main.cpp, which the rebuild replaces with
// ref_driver.cpp reading raw float32 frames).
#ifndef VIGRA_SHIM_IMPEX_HXX
#define VIGRA_SHIM_IMPEX_HXX
#include "multi_array.hxx"
#endif
