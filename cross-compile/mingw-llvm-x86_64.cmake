# Cross-compile the C runtime for 64-bit Windows with llvm-mingw.
# (Parity with the reference's Windows packaging path,
# reference: cross-compile/mingw-llvm-x86_64.cmake — ours targets only
# the dependency-free native/ runtime, so no extra flags are needed.)
#
#   cmake -B build-w64 -G Ninja native/ \
#     -DCMAKE_TOOLCHAIN_FILE=../cross-compile/mingw-llvm-x86_64.cmake

set(CMAKE_SYSTEM_NAME Windows)
set(CMAKE_SYSTEM_PROCESSOR x86_64)

set(RADE_TRIPLE ${CMAKE_SYSTEM_PROCESSOR}-w64-mingw32)
set(CMAKE_C_COMPILER ${RADE_TRIPLE}-clang)
set(CMAKE_C_COMPILER_TARGET ${RADE_TRIPLE})
set(CMAKE_AR ${RADE_TRIPLE}-ar)
set(CMAKE_RANLIB ${RADE_TRIPLE}-ranlib)
set(CMAKE_RC_COMPILER ${RADE_TRIPLE}-windres)

set(CMAKE_FIND_ROOT_PATH_MODE_PROGRAM NEVER)
set(CMAKE_FIND_ROOT_PATH_MODE_LIBRARY ONLY)
set(CMAKE_FIND_ROOT_PATH_MODE_INCLUDE ONLY)
