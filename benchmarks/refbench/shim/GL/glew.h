/* Headless shim for the reference build (benchmarks/refbench).
 * pathtracer.h includes <GL/glew.h> only for the GLubyte typedef
 * (mOutImg, pathtracer.h:59); no GL function is referenced by the
 * tracer core (pathtracer.cpp / mesh.cpp / image.cpp). This shim
 * provides exactly that typedef so the core compiles without GL. */
#ifndef __REFBENCH_GLEW_SHIM_H__
#define __REFBENCH_GLEW_SHIM_H__
typedef unsigned char GLubyte;
#endif
