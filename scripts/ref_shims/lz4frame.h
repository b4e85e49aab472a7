// Declaration-only LZ4 frame API shim: lets the reference's lz4_stream.hpp
// COMPILE in golden drivers. Drivers must stick to uncompressed paths —
// there is no lz4 library to link, so any actual use fails at link time
// (which is the point: accidental compressed-path use is caught).
#pragma once
#include <stddef.h>

typedef size_t LZ4F_errorCode_t;
typedef struct LZ4F_cctx_s LZ4F_cctx;
typedef struct LZ4F_dctx_s LZ4F_dctx;
typedef LZ4F_cctx* LZ4F_compressionContext_t;
typedef LZ4F_dctx* LZ4F_decompressionContext_t;
typedef struct { int unused; } LZ4F_preferences_t;
typedef struct { int unused; } LZ4F_compressOptions_t;
typedef struct { int unused; } LZ4F_decompressOptions_t;
#define LZ4F_VERSION 100
#define LZ4F_HEADER_SIZE_MAX 19

extern "C" {
unsigned LZ4F_isError(LZ4F_errorCode_t code);
const char* LZ4F_getErrorName(LZ4F_errorCode_t code);
LZ4F_errorCode_t LZ4F_createCompressionContext(LZ4F_cctx** c, unsigned v);
LZ4F_errorCode_t LZ4F_freeCompressionContext(LZ4F_cctx* c);
size_t LZ4F_compressBound(size_t size, const LZ4F_preferences_t* p);
size_t LZ4F_compressBegin(LZ4F_cctx* c, void* dst, size_t cap,
                          const LZ4F_preferences_t* p);
size_t LZ4F_compressUpdate(LZ4F_cctx* c, void* dst, size_t cap,
                           const void* src, size_t n,
                           const LZ4F_compressOptions_t* o);
size_t LZ4F_compressEnd(LZ4F_cctx* c, void* dst, size_t cap,
                        const LZ4F_compressOptions_t* o);
LZ4F_errorCode_t LZ4F_createDecompressionContext(LZ4F_dctx** d, unsigned v);
LZ4F_errorCode_t LZ4F_freeDecompressionContext(LZ4F_dctx* d);
size_t LZ4F_decompress(LZ4F_dctx* d, void* dst, size_t* dstn,
                       const void* src, size_t* srcn,
                       const LZ4F_decompressOptions_t* o);
}
