module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<8192x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<8192x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<8192x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 1, 4, 4>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 16, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 16, 512, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 16, 512, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 16, 512, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<512x128xf32>
    %c7936 = arith.constant 7936 : index
    %c7680 = arith.constant 7680 : index
    %c15 = arith.constant 15 : index
    %c7424 = arith.constant 7424 : index
    %c7168 = arith.constant 7168 : index
    %c14 = arith.constant 14 : index
    %c6912 = arith.constant 6912 : index
    %c6656 = arith.constant 6656 : index
    %c13 = arith.constant 13 : index
    %c6400 = arith.constant 6400 : index
    %c6144 = arith.constant 6144 : index
    %c12 = arith.constant 12 : index
    %c5888 = arith.constant 5888 : index
    %c5632 = arith.constant 5632 : index
    %c11 = arith.constant 11 : index
    %c5376 = arith.constant 5376 : index
    %c5120 = arith.constant 5120 : index
    %c10 = arith.constant 10 : index
    %c4864 = arith.constant 4864 : index
    %c4608 = arith.constant 4608 : index
    %c9 = arith.constant 9 : index
    %c4352 = arith.constant 4352 : index
    %c4096 = arith.constant 4096 : index
    %c8 = arith.constant 8 : index
    %c3840 = arith.constant 3840 : index
    %c3584 = arith.constant 3584 : index
    %c7 = arith.constant 7 : index
    %c3328 = arith.constant 3328 : index
    %c3072 = arith.constant 3072 : index
    %c6 = arith.constant 6 : index
    %c2816 = arith.constant 2816 : index
    %c2560 = arith.constant 2560 : index
    %c5 = arith.constant 5 : index
    %c2304 = arith.constant 2304 : index
    %c2048 = arith.constant 2048 : index
    %c4 = arith.constant 4 : index
    %c1792 = arith.constant 1792 : index
    %c1536 = arith.constant 1536 : index
    %c3 = arith.constant 3 : index
    %c1280 = arith.constant 1280 : index
    %c1024 = arith.constant 1024 : index
    %c2 = arith.constant 2 : index
    %c768 = arith.constant 768 : index
    %c512 = arith.constant 512 : index
    %c1 = arith.constant 1 : index
    %c256 = arith.constant 256 : index
    %cst_0 = arith.constant dense<0.000000e+00> : vector<256x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<256xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<256xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<256x512xf32>
    %c0 = arith.constant 0 : index
    %c3_i32 = arith.constant 3 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c3_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %11 = vector.extract_strided_slice %6 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %12 = tpu.matmul %11, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %12, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %12, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %13 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %13 {
      %242 = vector.load %arg9[%c0, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c0, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c0, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %12, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %12, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %14 = vector.extract_strided_slice %6 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %15 = tpu.matmul %14, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %15, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %15, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %16 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %16 {
      %242 = vector.load %arg9[%c256, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c256, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c256, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %15, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %15, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %17 = vector.load %arg4[%c0, %c1, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %18 = vector.shape_cast %17 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %19 = arith.extf %18 : vector<512x128xbf16> to vector<512x128xf32>
    %20 = arith.mulf %19, %cst : vector<512x128xf32>
    %21 = arith.truncf %20 : vector<512x128xf32> to vector<512x128xbf16>
    %22 = vector.load %arg5[%c0, %c1, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %23 = vector.shape_cast %22 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %24 = vector.load %arg6[%c0, %c1, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %25 = vector.shape_cast %24 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %26 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %27 = tpu.matmul %26, %23, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %27, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %27, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %28 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %28 {
      %242 = vector.load %arg9[%c512, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c512, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c512, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %27, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %27, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %29 = vector.extract_strided_slice %21 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %30 = tpu.matmul %29, %23, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %30, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %30, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c768, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c768, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c768, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %31 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %31 {
      %242 = vector.load %arg9[%c768, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c768, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c768, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %30, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %30, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %25, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c768, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c768, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c768, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %32 = vector.load %arg4[%c0, %c2, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %33 = vector.shape_cast %32 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %34 = arith.extf %33 : vector<512x128xbf16> to vector<512x128xf32>
    %35 = arith.mulf %34, %cst : vector<512x128xf32>
    %36 = arith.truncf %35 : vector<512x128xf32> to vector<512x128xbf16>
    %37 = vector.load %arg5[%c0, %c2, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %38 = vector.shape_cast %37 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %39 = vector.load %arg6[%c0, %c2, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %40 = vector.shape_cast %39 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %41 = vector.extract_strided_slice %36 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %42 = tpu.matmul %41, %38, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %42, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %42, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %43 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %43 {
      %242 = vector.load %arg9[%c1024, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c1024, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c1024, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %42, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %42, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %44 = vector.extract_strided_slice %36 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %45 = tpu.matmul %44, %38, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %45, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %45, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c1280, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1280, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1280, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %46 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %46 {
      %242 = vector.load %arg9[%c1280, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c1280, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c1280, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %45, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %45, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %40, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c1280, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1280, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1280, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %47 = vector.load %arg4[%c0, %c3, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %48 = vector.shape_cast %47 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %49 = arith.extf %48 : vector<512x128xbf16> to vector<512x128xf32>
    %50 = arith.mulf %49, %cst : vector<512x128xf32>
    %51 = arith.truncf %50 : vector<512x128xf32> to vector<512x128xbf16>
    %52 = vector.load %arg5[%c0, %c3, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %53 = vector.shape_cast %52 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %54 = vector.load %arg6[%c0, %c3, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %55 = vector.shape_cast %54 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %56 = vector.extract_strided_slice %51 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %57 = tpu.matmul %56, %53, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %57, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %57, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %58 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %58 {
      %242 = vector.load %arg9[%c1536, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c1536, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c1536, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %57, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %57, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %59 = vector.extract_strided_slice %51 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %60 = tpu.matmul %59, %53, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %60, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %60, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c1792, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1792, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1792, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %61 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %61 {
      %242 = vector.load %arg9[%c1792, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c1792, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c1792, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %60, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %60, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %55, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c1792, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c1792, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c1792, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %62 = vector.load %arg4[%c0, %c4, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %63 = vector.shape_cast %62 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %64 = arith.extf %63 : vector<512x128xbf16> to vector<512x128xf32>
    %65 = arith.mulf %64, %cst : vector<512x128xf32>
    %66 = arith.truncf %65 : vector<512x128xf32> to vector<512x128xbf16>
    %67 = vector.load %arg5[%c0, %c4, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %68 = vector.shape_cast %67 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %69 = vector.load %arg6[%c0, %c4, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %70 = vector.shape_cast %69 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %71 = vector.extract_strided_slice %66 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %72 = tpu.matmul %71, %68, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %72, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %72, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %70, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %73 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %73 {
      %242 = vector.load %arg9[%c2048, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c2048, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c2048, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %72, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %72, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %70, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %74 = vector.extract_strided_slice %66 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %75 = tpu.matmul %74, %68, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %75, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %75, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %70, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c2304, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2304, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2304, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %76 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %76 {
      %242 = vector.load %arg9[%c2304, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c2304, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c2304, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %75, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %75, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %70, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c2304, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2304, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2304, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %77 = vector.load %arg4[%c0, %c5, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %78 = vector.shape_cast %77 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %79 = arith.extf %78 : vector<512x128xbf16> to vector<512x128xf32>
    %80 = arith.mulf %79, %cst : vector<512x128xf32>
    %81 = arith.truncf %80 : vector<512x128xf32> to vector<512x128xbf16>
    %82 = vector.load %arg5[%c0, %c5, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %83 = vector.shape_cast %82 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %84 = vector.load %arg6[%c0, %c5, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %85 = vector.shape_cast %84 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %86 = vector.extract_strided_slice %81 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %87 = tpu.matmul %86, %83, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %87, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %87, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %85, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %88 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %88 {
      %242 = vector.load %arg9[%c2560, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c2560, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c2560, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %87, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %87, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %85, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %89 = vector.extract_strided_slice %81 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %90 = tpu.matmul %89, %83, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %90, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %90, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %85, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c2816, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2816, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2816, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %91 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %91 {
      %242 = vector.load %arg9[%c2816, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c2816, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c2816, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %90, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %90, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %85, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c2816, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c2816, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c2816, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %92 = vector.load %arg4[%c0, %c6, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %93 = vector.shape_cast %92 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %94 = arith.extf %93 : vector<512x128xbf16> to vector<512x128xf32>
    %95 = arith.mulf %94, %cst : vector<512x128xf32>
    %96 = arith.truncf %95 : vector<512x128xf32> to vector<512x128xbf16>
    %97 = vector.load %arg5[%c0, %c6, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %98 = vector.shape_cast %97 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %99 = vector.load %arg6[%c0, %c6, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %100 = vector.shape_cast %99 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %101 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %102 = tpu.matmul %101, %98, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %102, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %102, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %100, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %103 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %103 {
      %242 = vector.load %arg9[%c3072, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c3072, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c3072, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %102, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %102, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %100, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %104 = vector.extract_strided_slice %96 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %105 = tpu.matmul %104, %98, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %105, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %105, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %100, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c3328, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3328, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3328, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %106 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %106 {
      %242 = vector.load %arg9[%c3328, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c3328, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c3328, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %105, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %105, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %100, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c3328, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3328, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3328, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %107 = vector.load %arg4[%c0, %c7, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %108 = vector.shape_cast %107 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %109 = arith.extf %108 : vector<512x128xbf16> to vector<512x128xf32>
    %110 = arith.mulf %109, %cst : vector<512x128xf32>
    %111 = arith.truncf %110 : vector<512x128xf32> to vector<512x128xbf16>
    %112 = vector.load %arg5[%c0, %c7, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %113 = vector.shape_cast %112 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %114 = vector.load %arg6[%c0, %c7, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %115 = vector.shape_cast %114 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %116 = vector.extract_strided_slice %111 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %117 = tpu.matmul %116, %113, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %117, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %117, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %115, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %118 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %118 {
      %242 = vector.load %arg9[%c3584, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c3584, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c3584, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %117, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %117, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %115, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %119 = vector.extract_strided_slice %111 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %120 = tpu.matmul %119, %113, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %120, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %120, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %115, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c3840, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3840, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3840, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %121 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %121 {
      %242 = vector.load %arg9[%c3840, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c3840, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c3840, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %120, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %120, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %115, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c3840, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c3840, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c3840, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %122 = vector.load %arg4[%c0, %c8, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %123 = vector.shape_cast %122 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %124 = arith.extf %123 : vector<512x128xbf16> to vector<512x128xf32>
    %125 = arith.mulf %124, %cst : vector<512x128xf32>
    %126 = arith.truncf %125 : vector<512x128xf32> to vector<512x128xbf16>
    %127 = vector.load %arg5[%c0, %c8, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %128 = vector.shape_cast %127 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %129 = vector.load %arg6[%c0, %c8, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %130 = vector.shape_cast %129 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %131 = vector.extract_strided_slice %126 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %132 = tpu.matmul %131, %128, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %132, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %132, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %130, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c4096, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4096, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4096, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %133 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %133 {
      %242 = vector.load %arg9[%c4096, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c4096, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c4096, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %132, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %132, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %130, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c4096, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4096, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4096, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %134 = vector.extract_strided_slice %126 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %135 = tpu.matmul %134, %128, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %135, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %135, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %130, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c4352, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4352, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4352, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %136 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %136 {
      %242 = vector.load %arg9[%c4352, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c4352, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c4352, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %135, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %135, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %130, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c4352, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4352, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4352, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %137 = vector.load %arg4[%c0, %c9, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %138 = vector.shape_cast %137 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %139 = arith.extf %138 : vector<512x128xbf16> to vector<512x128xf32>
    %140 = arith.mulf %139, %cst : vector<512x128xf32>
    %141 = arith.truncf %140 : vector<512x128xf32> to vector<512x128xbf16>
    %142 = vector.load %arg5[%c0, %c9, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %143 = vector.shape_cast %142 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %144 = vector.load %arg6[%c0, %c9, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %145 = vector.shape_cast %144 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %146 = vector.extract_strided_slice %141 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %147 = tpu.matmul %146, %143, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %147, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %147, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %145, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c4608, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4608, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4608, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %148 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %148 {
      %242 = vector.load %arg9[%c4608, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c4608, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c4608, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %147, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %147, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %145, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c4608, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4608, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4608, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %149 = vector.extract_strided_slice %141 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %150 = tpu.matmul %149, %143, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %150, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %150, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %145, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c4864, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4864, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4864, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %151 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %151 {
      %242 = vector.load %arg9[%c4864, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c4864, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c4864, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %150, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %150, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %145, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c4864, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c4864, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c4864, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %152 = vector.load %arg4[%c0, %c10, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %153 = vector.shape_cast %152 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %154 = arith.extf %153 : vector<512x128xbf16> to vector<512x128xf32>
    %155 = arith.mulf %154, %cst : vector<512x128xf32>
    %156 = arith.truncf %155 : vector<512x128xf32> to vector<512x128xbf16>
    %157 = vector.load %arg5[%c0, %c10, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %158 = vector.shape_cast %157 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %159 = vector.load %arg6[%c0, %c10, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %160 = vector.shape_cast %159 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %161 = vector.extract_strided_slice %156 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %162 = tpu.matmul %161, %158, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %162, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %162, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %160, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c5120, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5120, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5120, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %163 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %163 {
      %242 = vector.load %arg9[%c5120, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c5120, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c5120, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %162, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %162, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %160, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c5120, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5120, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5120, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %164 = vector.extract_strided_slice %156 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %165 = tpu.matmul %164, %158, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %165, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %165, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %160, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c5376, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5376, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5376, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %166 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %166 {
      %242 = vector.load %arg9[%c5376, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c5376, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c5376, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %165, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %165, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %160, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c5376, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5376, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5376, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %167 = vector.load %arg4[%c0, %c11, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %168 = vector.shape_cast %167 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %169 = arith.extf %168 : vector<512x128xbf16> to vector<512x128xf32>
    %170 = arith.mulf %169, %cst : vector<512x128xf32>
    %171 = arith.truncf %170 : vector<512x128xf32> to vector<512x128xbf16>
    %172 = vector.load %arg5[%c0, %c11, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %173 = vector.shape_cast %172 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %174 = vector.load %arg6[%c0, %c11, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %175 = vector.shape_cast %174 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %176 = vector.extract_strided_slice %171 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %177 = tpu.matmul %176, %173, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %177, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %177, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %175, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c5632, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5632, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5632, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %178 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %178 {
      %242 = vector.load %arg9[%c5632, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c5632, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c5632, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %177, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %177, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %175, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c5632, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5632, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5632, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %179 = vector.extract_strided_slice %171 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %180 = tpu.matmul %179, %173, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %180, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %180, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %175, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c5888, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5888, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5888, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %181 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %181 {
      %242 = vector.load %arg9[%c5888, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c5888, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c5888, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %180, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %180, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %175, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c5888, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c5888, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c5888, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %182 = vector.load %arg4[%c0, %c12, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %183 = vector.shape_cast %182 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %184 = arith.extf %183 : vector<512x128xbf16> to vector<512x128xf32>
    %185 = arith.mulf %184, %cst : vector<512x128xf32>
    %186 = arith.truncf %185 : vector<512x128xf32> to vector<512x128xbf16>
    %187 = vector.load %arg5[%c0, %c12, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %188 = vector.shape_cast %187 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %189 = vector.load %arg6[%c0, %c12, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %190 = vector.shape_cast %189 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %191 = vector.extract_strided_slice %186 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %192 = tpu.matmul %191, %188, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %192, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %192, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %190, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c6144, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6144, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6144, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %193 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %193 {
      %242 = vector.load %arg9[%c6144, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c6144, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c6144, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %192, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %192, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %190, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c6144, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6144, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6144, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %194 = vector.extract_strided_slice %186 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %195 = tpu.matmul %194, %188, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %195, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %195, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %190, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c6400, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6400, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6400, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %196 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %196 {
      %242 = vector.load %arg9[%c6400, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c6400, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c6400, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %195, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %195, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %190, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c6400, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6400, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6400, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %197 = vector.load %arg4[%c0, %c13, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %198 = vector.shape_cast %197 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %199 = arith.extf %198 : vector<512x128xbf16> to vector<512x128xf32>
    %200 = arith.mulf %199, %cst : vector<512x128xf32>
    %201 = arith.truncf %200 : vector<512x128xf32> to vector<512x128xbf16>
    %202 = vector.load %arg5[%c0, %c13, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %203 = vector.shape_cast %202 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %204 = vector.load %arg6[%c0, %c13, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %205 = vector.shape_cast %204 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %206 = vector.extract_strided_slice %201 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %207 = tpu.matmul %206, %203, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %207, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %207, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %205, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c6656, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6656, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6656, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %208 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %208 {
      %242 = vector.load %arg9[%c6656, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c6656, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c6656, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %207, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %207, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %205, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c6656, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6656, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6656, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %209 = vector.extract_strided_slice %201 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %210 = tpu.matmul %209, %203, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %210, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %210, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %205, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c6912, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6912, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6912, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %211 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %211 {
      %242 = vector.load %arg9[%c6912, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c6912, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c6912, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %210, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %210, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %205, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c6912, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c6912, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c6912, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %212 = vector.load %arg4[%c0, %c14, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %213 = vector.shape_cast %212 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %214 = arith.extf %213 : vector<512x128xbf16> to vector<512x128xf32>
    %215 = arith.mulf %214, %cst : vector<512x128xf32>
    %216 = arith.truncf %215 : vector<512x128xf32> to vector<512x128xbf16>
    %217 = vector.load %arg5[%c0, %c14, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %218 = vector.shape_cast %217 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %219 = vector.load %arg6[%c0, %c14, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %220 = vector.shape_cast %219 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %221 = vector.extract_strided_slice %216 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %222 = tpu.matmul %221, %218, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %222, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %222, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %220, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c7168, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7168, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7168, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %223 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %223 {
      %242 = vector.load %arg9[%c7168, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c7168, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c7168, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %222, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %222, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %220, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c7168, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7168, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7168, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %224 = vector.extract_strided_slice %216 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %225 = tpu.matmul %224, %218, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %225, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %225, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %220, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c7424, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7424, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7424, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %226 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %226 {
      %242 = vector.load %arg9[%c7424, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c7424, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c7424, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %225, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %225, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %220, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c7424, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7424, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7424, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %227 = vector.load %arg4[%c0, %c15, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %228 = vector.shape_cast %227 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %229 = arith.extf %228 : vector<512x128xbf16> to vector<512x128xf32>
    %230 = arith.mulf %229, %cst : vector<512x128xf32>
    %231 = arith.truncf %230 : vector<512x128xf32> to vector<512x128xbf16>
    %232 = vector.load %arg5[%c0, %c15, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %233 = vector.shape_cast %232 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %234 = vector.load %arg6[%c0, %c15, %c0, %c0] : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %235 = vector.shape_cast %234 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %236 = vector.extract_strided_slice %231 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %237 = tpu.matmul %236, %233, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %237, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %237, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %235, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c7680, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7680, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7680, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %238 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %238 {
      %242 = vector.load %arg9[%c7680, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c7680, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c7680, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %237, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %237, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %235, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c7680, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7680, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7680, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %239 = vector.extract_strided_slice %231 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    %240 = tpu.matmul %239, %233, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<512x128xbf16>, vector<256x512xf32> -> vector<256x512xf32>
    scf.if %0 {
      %242 = vector.multi_reduction <maximumf>, %240, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %243 = vector.shape_cast %242 : vector<256xf32> to vector<256x1xf32>
      %244 = vector.broadcast %243 : vector<256x1xf32> to vector<256x128xf32>
      %245 = vector.broadcast %243 : vector<256x1xf32> to vector<256x512xf32>
      %246 = arith.subf %240, %245 : vector<256x512xf32>
      %247 = math.exp2 %246 : vector<256x512xf32>
      %248 = arith.truncf %247 : vector<256x512xf32> to vector<256x512xbf16>
      %249 = vector.multi_reduction <add>, %247, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %250 = vector.shape_cast %249 : vector<256xf32> to vector<256x1xf32>
      %251 = vector.broadcast %250 : vector<256x1xf32> to vector<256x128xf32>
      %252 = tpu.matmul %248, %235, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      tpu.vector_store %arg9[%c7936, %c0], %244 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7936, %c0], %251 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7936, %c0], %252 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %241 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %241 {
      %242 = vector.load %arg9[%c7936, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %243 = vector.load %arg10[%c7936, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %244 = vector.load %arg8[%c7936, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %245 = vector.multi_reduction <maximumf>, %240, %cst_2 [1] : vector<256x512xf32> to vector<256xf32>
      %246 = vector.shape_cast %245 : vector<256xf32> to vector<256x1xf32>
      %247 = vector.broadcast %246 : vector<256x1xf32> to vector<256x128xf32>
      %248 = arith.maximumf %242, %247 : vector<256x128xf32>
      %249 = vector.extract_strided_slice %248 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %250 = vector.broadcast %249 : vector<256x1xf32> to vector<256x512xf32>
      %251 = arith.subf %240, %250 : vector<256x512xf32>
      %252 = math.exp2 %251 : vector<256x512xf32>
      %253 = arith.subf %242, %248 : vector<256x128xf32>
      %254 = math.exp2 %253 : vector<256x128xf32>
      %255 = arith.truncf %252 : vector<256x512xf32> to vector<256x512xbf16>
      %256 = arith.mulf %243, %254 : vector<256x128xf32>
      %257 = vector.multi_reduction <add>, %252, %cst_1 [1] : vector<256x512xf32> to vector<256xf32>
      %258 = vector.shape_cast %257 : vector<256xf32> to vector<256x1xf32>
      %259 = vector.broadcast %258 : vector<256x1xf32> to vector<256x128xf32>
      %260 = arith.addf %256, %259 : vector<256x128xf32>
      %261 = tpu.matmul %255, %235, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x512xbf16>, vector<512x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %262 = vector.extract_strided_slice %254 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %263 = vector.broadcast %262 : vector<256x1xf32> to vector<256x128xf32>
      %264 = arith.mulf %244, %263 : vector<256x128xf32>
      %265 = arith.addf %264, %261 : vector<256x128xf32>
      tpu.vector_store %arg9[%c7936, %c0], %248 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c7936, %c0], %260 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c7936, %c0], %265 {strides = array<i32>} : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    scf.if %1 {
      %242 = vector.load %arg10[%c0, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %243 = vector.load %arg8[%c0, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %244 = vector.broadcast %242 : vector<512x1xf32> to vector<512x128xf32>
      %245 = arith.divf %243, %244 : vector<512x128xf32>
      %246 = arith.truncf %245 : vector<512x128xf32> to vector<512x128xbf16>
      %247 = vector.shape_cast %246 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %247 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %248 = vector.load %arg10[%c512, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %249 = vector.load %arg8[%c512, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %250 = vector.broadcast %248 : vector<512x1xf32> to vector<512x128xf32>
      %251 = arith.divf %249, %250 : vector<512x128xf32>
      %252 = arith.truncf %251 : vector<512x128xf32> to vector<512x128xbf16>
      %253 = vector.shape_cast %252 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c1, %c0, %c0], %253 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %254 = vector.load %arg10[%c1024, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %255 = vector.load %arg8[%c1024, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %256 = vector.broadcast %254 : vector<512x1xf32> to vector<512x128xf32>
      %257 = arith.divf %255, %256 : vector<512x128xf32>
      %258 = arith.truncf %257 : vector<512x128xf32> to vector<512x128xbf16>
      %259 = vector.shape_cast %258 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c2, %c0, %c0], %259 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %260 = vector.load %arg10[%c1536, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %261 = vector.load %arg8[%c1536, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %262 = vector.broadcast %260 : vector<512x1xf32> to vector<512x128xf32>
      %263 = arith.divf %261, %262 : vector<512x128xf32>
      %264 = arith.truncf %263 : vector<512x128xf32> to vector<512x128xbf16>
      %265 = vector.shape_cast %264 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c3, %c0, %c0], %265 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %266 = vector.load %arg10[%c2048, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %267 = vector.load %arg8[%c2048, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %268 = vector.broadcast %266 : vector<512x1xf32> to vector<512x128xf32>
      %269 = arith.divf %267, %268 : vector<512x128xf32>
      %270 = arith.truncf %269 : vector<512x128xf32> to vector<512x128xbf16>
      %271 = vector.shape_cast %270 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c4, %c0, %c0], %271 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %272 = vector.load %arg10[%c2560, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %273 = vector.load %arg8[%c2560, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %274 = vector.broadcast %272 : vector<512x1xf32> to vector<512x128xf32>
      %275 = arith.divf %273, %274 : vector<512x128xf32>
      %276 = arith.truncf %275 : vector<512x128xf32> to vector<512x128xbf16>
      %277 = vector.shape_cast %276 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c5, %c0, %c0], %277 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %278 = vector.load %arg10[%c3072, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %279 = vector.load %arg8[%c3072, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %280 = vector.broadcast %278 : vector<512x1xf32> to vector<512x128xf32>
      %281 = arith.divf %279, %280 : vector<512x128xf32>
      %282 = arith.truncf %281 : vector<512x128xf32> to vector<512x128xbf16>
      %283 = vector.shape_cast %282 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c6, %c0, %c0], %283 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %284 = vector.load %arg10[%c3584, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %285 = vector.load %arg8[%c3584, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %286 = vector.broadcast %284 : vector<512x1xf32> to vector<512x128xf32>
      %287 = arith.divf %285, %286 : vector<512x128xf32>
      %288 = arith.truncf %287 : vector<512x128xf32> to vector<512x128xbf16>
      %289 = vector.shape_cast %288 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c7, %c0, %c0], %289 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %290 = vector.load %arg10[%c4096, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %291 = vector.load %arg8[%c4096, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %292 = vector.broadcast %290 : vector<512x1xf32> to vector<512x128xf32>
      %293 = arith.divf %291, %292 : vector<512x128xf32>
      %294 = arith.truncf %293 : vector<512x128xf32> to vector<512x128xbf16>
      %295 = vector.shape_cast %294 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c8, %c0, %c0], %295 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %296 = vector.load %arg10[%c4608, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %297 = vector.load %arg8[%c4608, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %298 = vector.broadcast %296 : vector<512x1xf32> to vector<512x128xf32>
      %299 = arith.divf %297, %298 : vector<512x128xf32>
      %300 = arith.truncf %299 : vector<512x128xf32> to vector<512x128xbf16>
      %301 = vector.shape_cast %300 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c9, %c0, %c0], %301 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %302 = vector.load %arg10[%c5120, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %303 = vector.load %arg8[%c5120, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %304 = vector.broadcast %302 : vector<512x1xf32> to vector<512x128xf32>
      %305 = arith.divf %303, %304 : vector<512x128xf32>
      %306 = arith.truncf %305 : vector<512x128xf32> to vector<512x128xbf16>
      %307 = vector.shape_cast %306 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c10, %c0, %c0], %307 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %308 = vector.load %arg10[%c5632, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %309 = vector.load %arg8[%c5632, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %310 = vector.broadcast %308 : vector<512x1xf32> to vector<512x128xf32>
      %311 = arith.divf %309, %310 : vector<512x128xf32>
      %312 = arith.truncf %311 : vector<512x128xf32> to vector<512x128xbf16>
      %313 = vector.shape_cast %312 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c11, %c0, %c0], %313 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %314 = vector.load %arg10[%c6144, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %315 = vector.load %arg8[%c6144, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %316 = vector.broadcast %314 : vector<512x1xf32> to vector<512x128xf32>
      %317 = arith.divf %315, %316 : vector<512x128xf32>
      %318 = arith.truncf %317 : vector<512x128xf32> to vector<512x128xbf16>
      %319 = vector.shape_cast %318 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c12, %c0, %c0], %319 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %320 = vector.load %arg10[%c6656, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %321 = vector.load %arg8[%c6656, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %322 = vector.broadcast %320 : vector<512x1xf32> to vector<512x128xf32>
      %323 = arith.divf %321, %322 : vector<512x128xf32>
      %324 = arith.truncf %323 : vector<512x128xf32> to vector<512x128xbf16>
      %325 = vector.shape_cast %324 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c13, %c0, %c0], %325 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %326 = vector.load %arg10[%c7168, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %327 = vector.load %arg8[%c7168, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %328 = vector.broadcast %326 : vector<512x1xf32> to vector<512x128xf32>
      %329 = arith.divf %327, %328 : vector<512x128xf32>
      %330 = arith.truncf %329 : vector<512x128xf32> to vector<512x128xbf16>
      %331 = vector.shape_cast %330 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c14, %c0, %c0], %331 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %332 = vector.load %arg10[%c7680, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %333 = vector.load %arg8[%c7680, %c0] : memref<8192x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %334 = vector.broadcast %332 : vector<512x1xf32> to vector<512x128xf32>
      %335 = arith.divf %333, %334 : vector<512x128xf32>
      %336 = arith.truncf %335 : vector<512x128xf32> to vector<512x128xbf16>
      %337 = vector.shape_cast %336 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c15, %c0, %c0], %337 {strides = array<i32>} : memref<1x16x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c16_i32 = arith.constant 16 : i32
    %0 = arith.muli %arg1, %c16_i32 : i32
    %1 = arith.divsi %0, %c16_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c16_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c16_i32 = arith.constant 16 : i32
    %0 = arith.muli %arg1, %c16_i32 : i32
    %1 = arith.divsi %0, %c16_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c16_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

